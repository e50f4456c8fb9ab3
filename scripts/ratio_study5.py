"""Final targeted sweep: close book1; explore (8,18,20) and higher delta."""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")
import numpy as np
from scripts.ratio_study4 import ranks_for, est_size, quantize_prior_lr  # noqa
from redux_tpu.params import Parameters
from redux_tpu import native

RES = "/root/reference/resources"
files = ["calgary/book1", "calgary/bib", "calgary/geo", "calgary/news",
         "calgary/obj2", "calgary/pic", "calgary/book2", "large/bible.txt",
         "large/world192.txt"]
fm17, fm18, fm19 = (1<<17)-1, (1<<18)-1, (1<<19)-1
configs = [
    ("17w 16k d4 b64k", 16384, 4, 65278, fm17),
    ("17w 12k d5 b64k", 12288, 5, 65278, fm17),
    ("17w  8k d8 b64k",  8192, 8, 65278, fm17),
    ("18w 16k d8 b64k", 16384, 8, 65535+257, fm18),
    ("18w 32k d4 b64k", 32768, 4, 65535+257, fm18),
    ("18w 16k d4 b64k", 16384, 4, 65535+257, fm18),
    ("18w 24k d6 b64k", 24576, 6, 65535+257, fm18),
    ("18w 16k d6 b64k", 16384, 6, 65535+257, fm18),
    ("19w 32k d8 b64k", 32768, 8, 65535+257, fm19),
    ("19w 16k d8 b64k", 16384, 8, 65535+257, fm19),
    ("19w 32k d6 b64k", 32768, 6, 65535+257, fm19),
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
    if any(s is None for s in sizes.values()):
        print(f"{label:18s} invalid"); continue
    tot = sum(sizes.values())
    nwin = sum(sizes[f] <= refs[f] for f in files)
    losers = " ".join(f"{f.split('/')[1]}+{sizes[f]-refs[f]}" for f in files if sizes[f] > refs[f])
    print(f"{label:18s} {tot:9d} {tot/ref_tot:7.4f} {nwin:4d}  {losers}")
