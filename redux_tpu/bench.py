"""Device-resident benchmark pipeline (used by /root/repo/bench.py).

Times the on-chip codec path with input and compressed blocks resident in
HBM, syncing through scalar fetches (jax.block_until_ready is unreliable
on the axon backend).  Round-trip equality is verified on host, untimed.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from . import api
from .ops import coder
from .ops.ranks import precompute_encode_model
from .params import Parameters

BLOCK_SIZE = 4096


def _sync(*arrays) -> None:
    """Force completion of every pending computation feeding ``arrays``."""
    for a in arrays:
        np.asarray(jax.device_get(jnp.sum(jnp.ravel(a)[:1])))


def run_device_benchmark(data: bytes, block_size: int = BLOCK_SIZE, iters: int = 3):
    params = Parameters.tpu32()
    syms_np, lens_np, n_blocks = api._split_blocks(data, block_size)
    ic = api._init_cum(params, None)
    k = block_size
    n_words = api._static_words(params, k)

    syms = jax.device_put(jnp.asarray(syms_np))
    lens = jax.device_put(jnp.asarray(lens_np))
    icj = jax.device_put(jnp.asarray(ic))
    _sync(syms, lens, icj)

    def encode_step():
        pre = precompute_encode_model(syms, lens, icj, params.freq_max)
        return coder.encode_blocks_fast(*pre, lens, params, n_words)

    def decode_step(words):
        return coder.decode_blocks(words, lens, icj, params, k)

    # Warm up (compile) both directions.
    words, byte_lens, ovf = encode_step()
    decoded = decode_step(words)
    _sync(words, byte_lens, ovf, decoded)

    t0 = time.perf_counter()
    for _ in range(iters):
        words, byte_lens, ovf = encode_step()
    _sync(words, byte_lens, ovf)
    t1 = time.perf_counter()
    for _ in range(iters):
        decoded = decode_step(words)
    _sync(decoded)
    t2 = time.perf_counter()

    t_enc = (t1 - t0) / iters
    t_dec = (t2 - t1) / iters

    # Verification + wire size (host, untimed).
    got = np.asarray(decoded)[:n_blocks].astype(np.uint8).reshape(-1)[: len(data)]
    verified = bool(got.tobytes() == data)
    comp_bytes = int(np.asarray(byte_lens)[:n_blocks].sum())

    n = len(data)
    return {
        "encode_gbps": n / t_enc / 1e9,
        "decode_gbps": n / t_dec / 1e9,
        "aggregate_gbps": 2 * n / (t_enc + t_dec) / 1e9,
        "ratio": n / comp_bytes,
        "verified": verified,
        "n_blocks": n_blocks,
        "block_size": block_size,
    }
