"""Round 2 of the config study.

Part A: calibrate the entropy estimate against REAL coded sizes (oracle,
(8,15,17) + prior init) on a few 16 KiB blocks — quantifies the range-coder
rounding excess the estimate ignores.

Part B: extended config sweep with a largest-remainder prior apportionment
and bigger budgets, on the files that lost in round 1 of the study.

Usage: JAX_PLATFORMS=cpu python scripts/ratio_study2.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redux_tpu.models.dense import DenseModel, prior_init_cum, uniform_init_cum
from redux_tpu.oracle import compress_bytes
from redux_tpu.ops.ranks import precompute_encode_model
from redux_tpu.params import Parameters
from redux_tpu import native

RES = "/root/reference/resources"


def quantize_prior_lr(hist, params, budget):
    """Largest-remainder apportionment: uses the whole budget."""
    n = params.symbol_count
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
        order = np.argsort(-rem, kind="stable")[:short]
        fl[order] += 1
    extra[: hist.shape[0]] = fl
    return extra


def make_ic(data, params, budget, lr=True):
    if budget <= 0:
        return uniform_init_cum(params).astype(np.int64)
    hist = np.bincount(np.frombuffer(data, np.uint8), minlength=256)
    q = quantize_prior_lr if lr else None
    extra = q(hist, params, budget)[:256]
    full = np.zeros(params.symbol_count, dtype=np.int64)
    full[:256] = extra
    return prior_init_cum(full, params)


def est_bits(data, params, block_size, ic, use_eof):
    n = len(data)
    arr = np.frombuffer(data, dtype=np.uint8)
    n_blocks = (n + block_size - 1) // block_size
    icj = jnp.asarray(ic.astype(np.int32))
    total_bits = 0.0
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
        lo, hi, tot, el, eh, et = precompute_encode_model(
            jnp.asarray(syms), jnp.asarray(lens), icj, params.freq_max
        )
        lo, hi, tot = (np.asarray(x, np.float64) for x in (lo, hi, tot))
        el, eh, et = (np.asarray(x, np.float64) for x in (el, eh, et))
        mask = np.arange(block_size)[None, :] < lens[:, None]
        bits = np.where(mask, np.log2(tot) - np.log2(np.maximum(hi - lo, 1)), 0.0).sum(1)
        if use_eof:
            bits += np.log2(et) - np.log2(eh - el) + params.code_bits
        else:
            bits += 2
        total_bits += float((np.ceil(bits / 8) * 8).sum())
    return total_bits


def partA():
    print("== A: estimate vs real (oracle) coded size, (8,15,17), 16k blocks ==")
    p = Parameters(8, 15, 17)
    book1 = open(f"{RES}/calgary/book1", "rb").read()
    geo = open(f"{RES}/calgary/geo", "rb").read()
    for name, blob in [("book1", book1[:49152]), ("geo", geo[:32768])]:
        ic = make_ic(blob, p, 16126)
        real = 0
        for off in range(0, len(blob), 16384):
            blk = blob[off : off + 16384]
            real += len(compress_bytes(blk, DenseModel(p, ic.copy())))
        est = est_bits(blob, p, 16384, ic, use_eof=True) / 8
        print(f"  {name:8s}: real={real}  est={est:.0f}  excess={(real-est)/real*100:.3f}%")


def partB():
    print("== B: extended sweep (losers from round 1) ==")
    files = ["calgary/bib", "calgary/book1", "calgary/news", "large/bible.txt",
             "large/world192.txt", "calgary/geo", "calgary/obj2", "calgary/pic",
             "calgary/book2"]
    p32 = Parameters(8, 15, 17)
    configs = [
        ("16k b8191", p32, 16384, 8191),
        ("16k b16126", p32, 16384, 16126),
        ("24k b8191", p32, 24576, 8191),
        ("24k b12288", p32, 24576, 12288),
        ("32k b4095", p32, 32768, 4095),
        ("32k b8191", p32, 32768, 8191),
        ("32k b12288", p32, 32768, 12288),
    ]
    hdr = f"{'file':22s} {'ref':>9s}" + "".join(f" {n:>11s}" for n, *_ in configs)
    print(hdr)
    tot_ref, tots = 0, [0] * len(configs)
    for f in files:
        data = open(f"{RES}/{f}", "rb").read()
        ref = len(native.compress_bytes(data, Parameters.default()))
        tot_ref += ref
        row = f"{f:22s} {ref:9d}"
        for i, (name, params, bs, budget) in enumerate(configs):
            ic = make_ic(data, params, budget)
            n_blocks = (len(data) + bs - 1) // bs
            head = 28 + 4 * n_blocks + (512 if budget else 0) + 4
            s = head + int(est_bits(data, params, bs, ic, use_eof=False) // 8)
            tots[i] += s
            row += f" {s:10d}{'*' if s <= ref else ' '}"
        print(row, flush=True)
    row = f"{'TOTAL':22s} {tot_ref:9d}"
    for i in range(len(configs)):
        row += f" {tots[i]:10d}{'*' if tots[i] <= tot_ref else ' '}"
    print(row)


if __name__ == "__main__":
    partA()
    partB()
