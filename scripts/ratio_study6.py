"""Sweep 6: bigger budgets and deltas on wide configs; book1 must fall."""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")
from scripts.ratio_study4 import ranks_for, est_size
from redux_tpu.params import Parameters
from redux_tpu import native

RES = "/root/reference/resources"
files = ["calgary/book1", "calgary/bib", "calgary/geo", "calgary/news",
         "calgary/obj2", "calgary/pic", "calgary/book2", "large/bible.txt",
         "large/world192.txt"]
fm18, fm19, fm20 = (1<<18)-1, (1<<19)-1, (1<<20)-1
configs = [
    ("19w 32k d8 b96k",  32768, 8, 98304, fm19),
    ("19w 32k d8 b128k", 32768, 8, 131072, fm19),
    ("19w 32k d12 b96k", 32768, 12, 98304, fm19),
    ("20w 32k d16 b128k",32768, 16, 131072, fm20),
    ("20w 64k d8 b128k", 65536, 8, 131072, fm20),
    ("20w 32k d8 b128k", 32768, 8, 131072, fm20),
    ("20w 64k d8 b192k", 65536, 8, 196608, fm20),
    ("20w 32k d12 b192k",32768, 12, 196608, fm20),
    ("18w 32k d8 b64k",  32768, 8, 65535+257, fm18),
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
