"""Study 4: wider freq configs (8,16,18)/(8,17,19) with big blocks.

These exceed u32 products but are implementable with dual-u32 emulation
(split-multiply + 34/36-bit division); int32 model rows hold freq_max up
to 2^30.  Question: do big blocks + big prior budgets win the remaining
per-file losers (book1, bible, news, geo, bib)?
"""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np, jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from redux_tpu.ops.ranks import precompute_encode_model
from redux_tpu.params import Parameters
from redux_tpu import native

RES = "/root/reference/resources"

def quantize_prior_lr(hist, budget):
    extra = np.zeros(257, dtype=np.int64)
    total = int(hist.sum()); head = max(0, budget - 257)
    if total <= 0 or head <= 0: return extra
    ideal = hist.astype(np.float64) * head / total
    fl = np.floor(ideal).astype(np.int64); rem = ideal - fl
    short = head - int(fl.sum())
    if short > 0: fl[np.argsort(-rem, kind="stable")[:short]] += 1
    extra[:256] = fl
    return extra

def ranks_for(data, block_size):
    n = len(data); arr = np.frombuffer(data, dtype=np.uint8)
    n_blocks = (n + block_size - 1) // block_size
    uni = np.arange(258, dtype=np.int32)
    vs, cs, ds, ls = [], [], [], []
    lanes_per = max(1, (1 << 24) // block_size)
    for start in range(0, n_blocks, lanes_per):
        nb = min(lanes_per, n_blocks - start)
        lens = np.full(nb, block_size, dtype=np.int32)
        end_byte = min(n, (start + nb) * block_size)
        if start + nb == n_blocks and n % block_size: lens[-1] = n % block_size
        chunk = np.zeros(nb * block_size, dtype=np.uint8)
        chunk[: end_byte - start * block_size] = arr[start * block_size : end_byte]
        syms = chunk.reshape(nb, block_size)
        lo, hi, tot, *_ = precompute_encode_model(
            jnp.asarray(syms), jnp.asarray(lens), jnp.asarray(uni), (1 << 30) - 1)
        lo, hi = np.asarray(lo, np.int64), np.asarray(hi, np.int64)
        v = syms.astype(np.int64)
        c = lo - uni[v]; d = hi - uni[v + 1] - c
        vs.append(v); cs.append(c); ds.append(d); ls.append(lens)
    return (np.concatenate(vs), np.concatenate(cs), np.concatenate(ds), np.concatenate(ls))

def est_size(v, c, d, lens, data, delta, budget, freq_max, prior_u16cap=65535):
    hist = np.bincount(np.frombuffer(data, np.uint8), minlength=256)
    extra = quantize_prior_lr(hist, budget) if budget > 257 else np.zeros(257, np.int64)
    if extra.max(initial=0) > prior_u16cap: return None
    init = np.zeros(259, dtype=np.int64); init[1:258] = np.cumsum(1 + extra)
    init_total = init[257]; K = v.shape[1]
    if init_total + delta * K > freq_max: return None
    t = np.arange(K, dtype=np.int64)[None, :]
    mask = t < lens[:, None]
    lo = init[v] + delta * c; hi = init[v + 1] + delta * (c + d)
    tot = init_total + delta * np.minimum(t, lens[:, None])
    bits = np.where(mask, np.log2(tot) - np.log2(np.maximum(hi - lo, 1)), 0.0).sum(1) + 2
    head = 28 + 4 * lens.shape[0] + (512 if budget > 257 else 0) + 4
    return head + int((np.ceil(bits / 8) * 8).sum() // 8)

def main():
    files = ["calgary/bib", "calgary/book1", "calgary/news", "calgary/geo",
             "calgary/obj2", "calgary/pic", "calgary/book2",
             "large/bible.txt", "large/world192.txt"]
    fm16, fm17 = (1 << 16) - 1, (1 << 17) - 1
    # (label, block, delta, budget, freq_max)
    configs = [
        ("16w 32k d1 b16k",  32768, 1, 16384, fm16),
        ("16w 32k d1 b24k",  32768, 1, 24576, fm16),
        ("16w 48k d1 b16k",  49152, 1, 16126+257, fm16),
        ("16w 16k d2 b32k",  16384, 2, 32500, fm16),
        ("17w 64k d1 b32k",  65536, 1, 32768, fm17),
        ("17w 64k d1 b64k",  65536, 1, 65278, fm17),
        ("17w 32k d2 b64k",  32768, 2, 65278, fm17),
        ("17w 32k d1 b32k",  32768, 1, 32768, fm17),
        ("17w 96k d1 b32k",  98304, 1, 32768, fm17),
        ("17w 16k d4 b64k",  16384, 4, 65278, fm17),
    ]
    refs, results = {}, {}
    rank_cache = {}
    for f in files:
        data = open(f"{RES}/{f}", "rb").read()
        refs[f] = len(native.compress_bytes(data, Parameters.default()))
        for label, bs, delta, budget, fm in configs:
            if bs not in rank_cache:
                rank_cache[bs] = ranks_for(data, bs)
            s = est_size(*rank_cache[bs], data, delta, budget, fm)
            results.setdefault(label, {})[f] = s
        rank_cache.clear()
        print("done", f, file=sys.stderr, flush=True)
    ref_tot = sum(refs.values())
    print(f"ref total = {ref_tot}")
    print(f"{'config':18s} {'total':>9s} {'vs_ref':>7s} {'wins':>4s}  losers")
    for label, sizes in results.items():
        if any(s is None for s in sizes.values()):
            print(f"{label:18s} invalid (freeze/cap)"); continue
        tot = sum(sizes.values())
        nwin = sum(sizes[f] <= refs[f] for f in files)
        losers = " ".join(f"{f.split('/')[1]}+{sizes[f]-refs[f]}" for f in files if sizes[f] > refs[f])
        print(f"{label:18s} {tot:9d} {tot/ref_tot:7.4f} {nwin:4d}  {losers}")
if __name__ == "__main__":
    main()
