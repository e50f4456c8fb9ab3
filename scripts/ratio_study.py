"""Config study: estimated RXT archive size vs the reference stream size.

For every corpus file this computes, from the closed-form rank precompute
(the same per-symbol (low, high, total) triples the real encoder consumes),
the information-content estimate of the block-parallel archive:

    bits(block) = sum_t  log2(tot_t) - log2(hi_t - lo_t)      [data symbols]
                + terminator                                   [EOF+drain or 2-bit flush]
    archive     = header + 4*n_blocks + [512 prior] + sum ceil(bits/8)

and compares it against the exact reference stream size (native C++ codec,
reference semantics, (8,30,32) uniform — what `redux -c` would emit).

The estimate ignores range-coder rounding excess (<~0.5%, and comparable
across configs since code = freq + 2 everywhere), so it ranks
(block_size, prior_budget, params, eof-mode) choices; winners are then
verified with the real encoder.

Usage: JAX_PLATFORMS=cpu python scripts/ratio_study.py [--quick]
"""

import math
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redux_tpu.models.dense import prior_init_cum, quantize_prior, uniform_init_cum
from redux_tpu.ops.ranks import precompute_encode_model
from redux_tpu.params import Parameters
from redux_tpu import native

RES = "/root/reference/resources"


def est_block_bits(data: bytes, params: Parameters, block_size: int,
                   prior_budget: int, use_eof: bool) -> float:
    """Estimated total payload bits for all blocks of one file."""
    n = len(data)
    arr = np.frombuffer(data, dtype=np.uint8)
    if prior_budget > 0:
        hist = np.bincount(arr, minlength=256)
        budget = min(prior_budget, params.freq_max // 4)
        extra = quantize_prior(hist, params, budget)[:256]
        full = np.zeros(params.symbol_count, dtype=np.int64)
        full[:256] = extra
        ic = prior_init_cum(full, params).astype(np.int32)
    else:
        ic = uniform_init_cum(params).astype(np.int32)

    n_blocks = (n + block_size - 1) // block_size
    total_bits = 0.0
    # Process in lane-chunks to bound CPU memory for the rank triangle.
    lanes_per = max(1, (1 << 24) // max(block_size, 1))
    icj = jnp.asarray(ic)
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
        lo, hi, tot = np.asarray(lo, np.float64), np.asarray(hi, np.float64), np.asarray(tot, np.float64)
        el, eh, et = np.asarray(el, np.float64), np.asarray(eh, np.float64), np.asarray(et, np.float64)
        mask = np.arange(block_size)[None, :] < lens[:, None]
        bits = np.where(mask, np.log2(tot) - np.log2(np.maximum(hi - lo, 1)), 0.0).sum(axis=1)
        if use_eof:
            bits += np.log2(et) - np.log2(eh - el)  # EOF symbol
            bits += params.code_bits  # drain (codec.rs:91-99), upper bound
        else:
            bits += 2  # minimal terminator: 2 bits always suffice
        total_bits += float(np.ceil(bits / 8).sum() * 8)
    return total_bits


def archive_size(data: bytes, params, block_size, prior_budget, use_eof) -> int:
    n_blocks = (len(data) + block_size - 1) // block_size
    head = 28 + 4 * n_blocks + (512 if prior_budget > 0 else 0) + 4  # +4 crc
    bits = est_block_bits(data, params, block_size, prior_budget, use_eof)
    return head + int(bits // 8)


def main():
    quick = "--quick" in sys.argv
    corpora = ["calgary", "large"] if quick else ["calgary", "canterbury", "large"]
    files = []
    for c in corpora:
        d = os.path.join(RES, c)
        for name in sorted(os.listdir(d)):
            files.append((f"{c}/{name}", open(os.path.join(d, name), "rb").read()))
    if quick:
        files = [f for f in files if len(f[1]) > 100_000]

    p32 = Parameters(8, 15, 17)
    p64 = Parameters(8, 30, 32)
    configs = [
        ("ref-style 64k eof nopr p64", p64, 65536, 0, True),
        ("64k eof prior p64", p64, 65536, 8192, True),
        ("64k noeof prior p64", p64, 65536, 8192, False),
        ("64k noeof prior p32", p32, 65536, 8192, False),
        ("32k noeof prior p32", p32, 32768, 8192, False),
        ("16k noeof prior p32", p32, 16384, 8192, False),
        ("16k noeof prior16k p32", p32, 16384, 16384, False),
        ("8k noeof prior p32", p32, 8192, 8192, False),
        ("4k noeof prior p32", p32, 4096, 8192, False),
        ("16k noeof nopr p32", p32, 16384, 0, False),
    ]

    print(f"{'file':28s} {'size':>9s} {'ref':>9s}", end="")
    for name, *_ in configs:
        print(f" {name.split()[0]+('' if 'nopr' in name else '+')+name.split()[1][:4]:>11s}", end="")
    print()

    tot_ref = 0
    tot_cfg = [0] * len(configs)
    for fname, data in files:
        ref = len(native.compress_bytes(data, Parameters.default()))
        tot_ref += ref
        print(f"{fname:28s} {len(data):9d} {ref:9d}", end="", flush=True)
        for i, (name, params, bs, pb, eof) in enumerate(configs):
            s = archive_size(data, params, bs, pb, eof)
            tot_cfg[i] += s
            mark = "*" if s <= ref else " "
            print(f" {s:10d}{mark}", end="", flush=True)
        print()
    print(f"{'TOTAL':28s} {'':9s} {tot_ref:9d}", end="")
    for i, (name, *_ ) in enumerate(configs):
        print(f" {tot_cfg[i]:10d}{'*' if tot_cfg[i] <= tot_ref else ' '}", end="")
    print()
    print()
    for i, (name, *_rest) in enumerate(configs):
        print(f"{name:28s} total={tot_cfg[i]:9d}  vs ref {tot_cfg[i]/tot_ref:7.4f}")


if __name__ == "__main__":
    main()
