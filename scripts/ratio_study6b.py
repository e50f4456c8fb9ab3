"""Sweep 6b: u16-clamped priors (production behavior) + big budgets."""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")
import numpy as np
from scripts.ratio_study4 import ranks_for, quantize_prior_lr
from redux_tpu.params import Parameters
from redux_tpu import native

RES = "/root/reference/resources"

def est_size(v, c, d, lens, data, delta, budget, freq_max):
    hist = np.bincount(np.frombuffer(data, np.uint8), minlength=256)
    extra = quantize_prior_lr(hist, budget) if budget > 257 else np.zeros(257, np.int64)
    extra = np.minimum(extra, 65535)  # u16 storage clamp
    init = np.zeros(259, dtype=np.int64); init[1:258] = np.cumsum(1 + extra)
    init_total = init[257]; K = v.shape[1]
    if init_total + delta * K > freq_max:
        return None
    t = np.arange(K, dtype=np.int64)[None, :]
    mask = t < lens[:, None]
    lo = init[v] + delta * c; hi = init[v + 1] + delta * (c + d)
    tot = init_total + delta * np.minimum(t, lens[:, None])
    bits = np.where(mask, np.log2(tot) - np.log2(np.maximum(hi - lo, 1)), 0.0).sum(1) + 2
    head = 28 + 4 * lens.shape[0] + (512 if budget > 257 else 0) + 4
    return head + int((np.ceil(bits / 8) * 8).sum() // 8)

files = ["calgary/book1", "calgary/bib", "calgary/geo", "calgary/news",
         "calgary/obj2", "calgary/pic", "calgary/book2", "large/bible.txt",
         "large/world192.txt"]
fm18, fm19, fm20 = (1<<18)-1, (1<<19)-1, (1<<20)-1
configs = [
    ("18w 16k d8 b64k",  16384, 8, 65535+257, fm18),
    ("19w 32k d8 b64k",  32768, 8, 65535+257, fm19),
    ("19w 32k d8 b96k",  32768, 8, 98304, fm19),
    ("19w 32k d8 b128k", 32768, 8, 131072, fm19),
    ("19w 32k d12 b96k", 32768, 12, 98304, fm19),
    ("19w 16k d8 b96k",  16384, 8, 98304, fm19),
    ("20w 32k d16 b128k",32768, 16, 131072, fm20),
    ("20w 32k d8 b128k", 32768, 8, 131072, fm20),
    ("20w 64k d8 b192k", 65536, 8, 196608, fm20),
    ("20w 32k d12 b192k",32768, 12, 196608, fm20),
    ("20w 64k d12 b128k",65536, 12, 131072, fm20),
]
refs, results = {}, {}
for f in files:
    data = open(f"{RES}/{f}", "rb").read()
    refs[f] = len(native.compress_bytes(data, Parameters.default()))
    cache = {}
    for label, bs, delta, budget, fm in configs:
        if bs not in cache: cache[bs] = ranks_for(data, bs)
        results.setdefault(label, {})[f] = est_size(*cache[bs], data, delta, budget, fm)
    print("done", f, file=sys.stderr, flush=True)
ref_tot = sum(refs.values())
print(f"ref total = {ref_tot}")
for label, sizes in results.items():
    bad = [f for f, s in sizes.items() if s is None]
    if bad:
        print(f"{label:20s} invalid ({bad[0]})"); continue
    tot = sum(sizes.values())
    nwin = sum(sizes[f] <= refs[f] for f in files)
    losers = " ".join(f"{f.split('/')[1]}+{sizes[f]-refs[f]}" for f in files if sizes[f] > refs[f])
    print(f"{label:20s} {tot:9d} {tot/ref_tot:7.4f} {nwin:4d}  {losers}")
