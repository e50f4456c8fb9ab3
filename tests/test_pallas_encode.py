"""Differential tests: Pallas encode kernel vs the XLA v2 encoder/oracle.

CPU runs use Pallas interpreter mode — the same semantics the Mosaic
TPU path compiles, so stream bit-exactness is pinned without hardware.
"""

import numpy as np
import jax.numpy as jnp

from redux_tpu import oracle
from redux_tpu.models.dense import uniform_init_cum
from redux_tpu.ops.coder import max_block_words
from redux_tpu.ops.pallas_encode import encode_blocks_pallas, encode_blocks_pallas_m
from redux_tpu.ops.ranks import precompute_encode_model
from redux_tpu.params import Parameters


def _run(blocks, params, delta, k):
    n = len(blocks)
    syms = np.zeros((n, k), dtype=np.int32)
    lens = np.zeros(n, dtype=np.int32)
    for i, d in enumerate(blocks):
        syms[i, : len(d)] = np.frombuffer(d, dtype=np.uint8)
        lens[i] = len(d)
    ic = uniform_init_cum(params).astype(np.int32)
    lo, hi, tot, _, _, _ = precompute_encode_model(
        jnp.asarray(syms), jnp.asarray(lens), jnp.asarray(ic), params.freq_max,
        delta=delta, with_tot=False,
    )
    assert tot is None  # totals are computed in-kernel (closed form of t)
    max_count = min(params.symbol_count + delta * k, params.freq_max)
    n_words = max_block_words(max_count, params.symbol_count, params, k)
    words, byte_lens, ovf = encode_blocks_pallas(
        lo, hi, jnp.asarray(lens), jnp.asarray(ic, dtype=jnp.int32)[-1],
        params, n_words, delta
    )
    words = np.asarray(words)
    byte_lens = np.asarray(byte_lens)
    assert not np.asarray(ovf).any()
    for i, d in enumerate(blocks):
        exp = oracle.compress_block(d, params, ic.astype(np.int64), delta)
        got = words[i].astype(">u4").tobytes()[: byte_lens[i]]
        assert got == exp, (
            f"block {i}: len {len(got)} vs {len(exp)}; "
            f"first diff at {next((j for j in range(min(len(got), len(exp))) if got[j] != exp[j]), -1)}"
        )


def test_wide_config_mixed_blocks():
    params = Parameters.tpu_wide()
    rng = np.random.default_rng(0)
    k = 300
    blocks = [
        bytes(rng.integers(0, 256, k, dtype=np.uint8)),
        bytes([65] * k),
        (b"the quick brown fox jumps over the lazy dog. " * 10)[:k],
        b"x",
        bytes(rng.integers(0, 256, 97, dtype=np.uint8)),
    ]
    _run(blocks, params, delta=16, k=k)


def test_u32_config_delta1():
    params = Parameters.tpu32()
    rng = np.random.default_rng(1)
    k = 200
    blocks = [
        bytes(rng.integers(0, 256, k, dtype=np.uint8)),
        (b"abcabcabd" * 40)[:k],
    ]
    _run(blocks, params, delta=1, k=k)


def test_epoch_boundaries_and_tiles():
    """k not a multiple of the 32-step epoch; > 128 lanes (2 tiles)."""
    params = Parameters.tpu_wide()
    rng = np.random.default_rng(2)
    k = 77
    blocks = [bytes(rng.integers(0, 256, rng.integers(1, k + 1), dtype=np.uint8)) for _ in range(130)]
    _run(blocks, params, delta=16, k=k)


def test_freeze_plateau():
    params = Parameters(8, 14, 16)  # small cap freezes mid-block
    rng = np.random.default_rng(3)
    k = 600
    blocks = [bytes(rng.integers(0, 8, k, dtype=np.uint8))]
    _run(blocks, params, delta=4, k=k)


def _run_m(blocks, params, delta, k, prior=False):
    """Model-in-kernel encoder vs the sequential oracle."""
    n = len(blocks)
    syms = np.zeros((n, k), dtype=np.uint8)
    lens = np.zeros(n, dtype=np.int32)
    for i, d in enumerate(blocks):
        syms[i, : len(d)] = np.frombuffer(d, dtype=np.uint8)
        lens[i] = len(d)
    ic = uniform_init_cum(params).astype(np.int32)
    if prior:
        from redux_tpu.models.dense import prior_init_cum

        full = np.zeros(params.symbol_count, dtype=np.int64)
        full[:256] = 3
        ic = prior_init_cum(full, params).astype(np.int32)
    max_count = min(int(ic[-1]) + delta * k, params.freq_max)
    n_words = max_block_words(max_count, params.symbol_count, params, k)
    words, byte_lens, ovf = encode_blocks_pallas_m(
        jnp.asarray(syms), jnp.asarray(lens), jnp.asarray(ic), params, n_words, delta
    )
    words = np.asarray(words)
    byte_lens = np.asarray(byte_lens)
    assert not np.asarray(ovf).any()
    for i, d in enumerate(blocks):
        exp = oracle.compress_block(d, params, ic.astype(np.int64), delta)
        got = words[i].astype(">u4").tobytes()[: byte_lens[i]]
        assert got == exp, f"block {i}: len {len(got)} vs {len(exp)}"


def test_model_in_kernel_wide_mixed():
    params = Parameters.tpu_wide()
    rng = np.random.default_rng(4)
    k = 300
    blocks = [
        bytes(rng.integers(0, 256, k, dtype=np.uint8)),
        bytes([65] * k),
        (b"the quick brown fox jumps over the lazy dog. " * 10)[:k],
        b"x",
        bytes(rng.integers(0, 256, 97, dtype=np.uint8)),
    ]
    _run_m(blocks, params, delta=16, k=k)


def test_model_in_kernel_prior_and_freeze():
    params = Parameters(8, 14, 16)
    rng = np.random.default_rng(5)
    k = 600
    blocks = [bytes(rng.integers(0, 8, k, dtype=np.uint8)),
              (b"abcabcabd" * 80)[:k]]
    _run_m(blocks, params, delta=4, k=k, prior=True)
