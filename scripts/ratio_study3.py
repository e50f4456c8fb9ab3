"""Config study round 3: adaptation increment delta > 1.

The reference adapts by +1 per symbol (adaptive_tree.rs:86-89).  Our format
may use any increment delta: cum_t[i] = init[i] + delta * c_t(i), which
adapts faster after each block's model reset — and keeps the closed-form
rank precompute (ranks are init/delta independent when no freeze binds).

For each block size, ranks (c, d) are computed ONCE with a no-freeze call;
then (delta, prior budget) sweeps are pure numpy on the rank arrays:

    lo  = init[v] + delta*c        hi = init[v+1] + delta*(c+d)
    tot = init_total + delta*t     bits = sum log2(tot) - log2(hi - lo)

Only no-freeze combos are considered: init_total + delta*K <= freq_max.

Usage: JAX_PLATFORMS=cpu python scripts/ratio_study3.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redux_tpu.ops.ranks import precompute_encode_model
from redux_tpu.params import Parameters
from redux_tpu import native

RES = "/root/reference/resources"
P32 = Parameters(8, 15, 17)
FREQ_MAX = P32.freq_max  # 32767


def quantize_prior_lr(hist, budget):
    n = 257
    extra = np.zeros(n, dtype=np.int64)
    total = int(hist.sum())
    head = max(0, budget - n)
    if total <= 0 or head <= 0:
        return extra
    ideal = hist.astype(np.float64) * head / total
    fl = np.floor(ideal).astype(np.int64)
    rem = ideal - fl
    short = head - int(fl.sum())
    if short > 0:
        fl[np.argsort(-rem, kind="stable")[:short]] += 1
    extra[:256] = fl
    return extra


def ranks_for(data, block_size):
    """(v, c, d, lens) rank arrays for all blocks of one file (no freeze)."""
    n = len(data)
    arr = np.frombuffer(data, dtype=np.uint8)
    n_blocks = (n + block_size - 1) // block_size
    uni = np.arange(258, dtype=np.int32)
    vs, cs, ds, ls = [], [], [], []
    lanes_per = max(1, (1 << 24) // block_size)
    for start in range(0, n_blocks, lanes_per):
        nb = min(lanes_per, n_blocks - start)
        lens = np.full(nb, block_size, dtype=np.int32)
        end_byte = min(n, (start + nb) * block_size)
        if start + nb == n_blocks and n % block_size:
            lens[-1] = n % block_size
        chunk = np.zeros(nb * block_size, dtype=np.uint8)
        chunk[: end_byte - start * block_size] = arr[start * block_size : end_byte]
        syms = chunk.reshape(nb, block_size)
        # freq_max = huge => t_freeze never binds => raw ranks.
        lo, hi, tot, *_ = precompute_encode_model(
            jnp.asarray(syms), jnp.asarray(lens), jnp.asarray(uni), (1 << 30) - 1
        )
        lo, hi = np.asarray(lo, np.int64), np.asarray(hi, np.int64)
        v = syms.astype(np.int64)
        c = lo - uni[v]
        d = hi - uni[v + 1] - c
        vs.append(v); cs.append(c); ds.append(d); ls.append(lens)
    return (np.concatenate(vs), np.concatenate(cs), np.concatenate(ds),
            np.concatenate(ls))


def est_size(v, c, d, lens, data, block_size, delta, budget):
    hist = np.bincount(np.frombuffer(data, np.uint8), minlength=256)
    extra = quantize_prior_lr(hist, budget) if budget > 0 else np.zeros(257, np.int64)
    init = np.zeros(259, dtype=np.int64)
    init[1:258] = np.cumsum(1 + extra)
    init_total = init[257]
    if init_total + delta * block_size > FREQ_MAX:
        return None  # freeze would bind; out of scope
    K = v.shape[1]
    t = np.arange(K, dtype=np.int64)[None, :]
    mask = t < lens[:, None]
    lo = init[v] + delta * c
    hi = init[v + 1] + delta * (c + d)
    tot = init_total + delta * np.minimum(t, lens[:, None])
    bits = np.where(mask, np.log2(tot) - np.log2(np.maximum(hi - lo, 1)), 0.0).sum(1)
    bits += 2  # no-EOF terminator
    n_blocks = lens.shape[0]
    head = 28 + 4 * n_blocks + (512 if budget else 0) + 4
    return head + int((np.ceil(bits / 8) * 8).sum() // 8)


def main():
    files = ["calgary/bib", "calgary/book1", "calgary/news", "calgary/geo",
             "calgary/obj2", "calgary/pic", "calgary/book2",
             "large/bible.txt", "large/world192.txt"]
    blocks = [8192, 12288, 16384, 24576]
    deltas = [1, 2, 3, 4]
    results = {}
    refs = {}
    for f in files:
        data = open(f"{RES}/{f}", "rb").read()
        refs[f] = len(native.compress_bytes(data, Parameters.default()))
        for bs in blocks:
            v, c, d, lens = ranks_for(data, bs)
            for delta in deltas:
                bmax = FREQ_MAX - delta * bs - 257
                for budget in sorted({min(8191, bmax), min(16126, bmax), bmax}):
                    if budget < 0:
                        continue
                    s = est_size(v, c, d, lens, data, bs, delta, budget + 257)
                    if s is not None:
                        results.setdefault((bs, delta, budget + 257), {})[f] = s
        print(f"done {f}", file=sys.stderr, flush=True)

    ref_tot = sum(refs.values())
    rows = []
    for key, sizes in results.items():
        if len(sizes) < len(files):
            continue
        tot = sum(sizes.values())
        nwin = sum(sizes[f] <= refs[f] for f in files)
        rows.append((tot, nwin, key, sizes))
    rows.sort()
    print(f"ref total = {ref_tot}")
    print(f"{'bs':>6s} {'dlt':>3s} {'budget':>6s} {'total':>9s} {'vs_ref':>7s} {'wins':>4s}  losers")
    for tot, nwin, (bs, delta, budget), sizes in rows[:18]:
        losers = " ".join(
            f"{f.split('/')[1]}+{sizes[f]-refs[f]}" for f in files if sizes[f] > refs[f]
        )
        print(f"{bs:6d} {delta:3d} {budget:6d} {tot:9d} {tot/ref_tot:7.4f} {nwin:4d}  {losers}")


if __name__ == "__main__":
    main()
