"""Differential tests: Pallas model-values kernel vs the rank precompute.

The kernel re-derives the encode-side (lo, hi) model values with the
decoder's dense-row sweep instead of the closed-form rank formulation
(ops/ranks.py) — two independent derivations of the same adaptive model
(adaptive_linear.rs:33-39 semantics), asserted identical, and the whole
encode composition asserted bit-identical to the sequential oracle.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from redux_tpu.models.dense import prior_init_cum, uniform_init_cum
from redux_tpu.ops.pallas_model import model_lohi_pallas
from redux_tpu.ops.ranks import precompute_encode_model
from redux_tpu.params import Parameters


def _check(syms, lens, ic, params, delta):
    lo_k, hi_k = model_lohi_pallas(
        jnp.asarray(syms), jnp.asarray(lens), jnp.asarray(ic), params, delta
    )
    lo_r, hi_r, _, _, _, _ = precompute_encode_model(
        jnp.asarray(syms), jnp.asarray(lens), jnp.asarray(ic),
        params.freq_max, delta=delta, with_tot=False,
    )
    k = syms.shape[1]
    # Positions past lens are don't-care in both derivations; compare the
    # live prefix of every lane.
    for i in range(syms.shape[0]):
        n = int(lens[i])
        np.testing.assert_array_equal(
            np.asarray(lo_k)[i, :n], np.asarray(lo_r)[i, :n], err_msg=f"lo {i}"
        )
        np.testing.assert_array_equal(
            np.asarray(hi_k)[i, :n], np.asarray(hi_r)[i, :n], err_msg=f"hi {i}"
        )


def test_model_kernel_matches_ranks_uniform():
    params = Parameters.tpu_wide()
    rng = np.random.default_rng(0)
    k = 96
    syms = rng.integers(0, 256, (9, k)).astype(np.int32)
    syms[1] = 0  # degenerate single symbol
    syms[2] = 255
    lens = np.array([k, k, k, 1, 17, 0, k, k - 1, 33], np.int32)
    ic = uniform_init_cum(params).astype(np.int32)
    _check(syms, lens, ic, params, 16)
    _check(syms, lens, ic, params, 1)


def test_model_kernel_matches_ranks_prior_and_freeze():
    """Warm-start prior init + a tiny freq budget so the freeze engages
    mid-block (the t_freeze closed form must match ranks.py exactly)."""
    params = Parameters(8, 14, 16)  # freq_max 16383: freeze reachable
    rng = np.random.default_rng(1)
    k = 160
    syms = rng.integers(0, 256, (5, k)).astype(np.int32)
    lens = np.full(5, k, np.int32)
    full = np.zeros(params.symbol_count, dtype=np.int64)
    full[:256] = rng.integers(0, 50, 256)
    ic = prior_init_cum(full, params).astype(np.int32)
    # delta 100 drives the total across freq_max inside the block
    _check(syms, lens, ic, params, 100)


def test_model_kernel_bucket_sweep_matches_ranks(monkeypatch):
    """The production TWO-LEVEL sweep (hardware default) on the
    interpreter: bucket = v >> 3, the pre-update window select, both
    one-hot lo/hi taps including the v % 8 == 7 coarse-row boundary
    case, and the coarse-row suffix maintenance — against the rank
    closed form, with a freeze-overshoot delta.  Distinct k per config
    keeps the jit cache from reusing a chunk-sweep compile."""
    monkeypatch.setenv("REDUX_TPU_MODEL_SWEEP", "bucket")
    monkeypatch.setenv("REDUX_TPU_WSEL", "2")  # split select chains variant
    monkeypatch.setenv("REDUX_TPU_MODEL_GROUP", "2")  # paired bucket step
    params = Parameters(8, 14, 16)
    rng = np.random.default_rng(5)
    k = 192
    syms = rng.integers(0, 256, (8, k)).astype(np.int32)
    syms[1] = 7  # every hi read crosses a bucket boundary
    syms[2] = 255  # top bucket; boundary reads hit C[32] = cdf[256]
    syms[3] = 0
    syms[4, ::2] = 15  # alternate boundary/interior
    lens = np.array([k, k, k, k, k, 1, 0, k - 3], np.int32)
    ic = uniform_init_cum(params).astype(np.int32)
    _check(syms, lens, ic, params, 16)
    _check(syms, lens, ic, params, 100)  # overshoots freq_max mid-block


def test_model_kernel_feeds_coder_bit_identical(monkeypatch):
    """Full composition: kernel model values -> streaming coder, against
    the sequential oracle's v2 payloads."""
    from redux_tpu import oracle
    from redux_tpu.ops.pallas_encode import encode_blocks_pallas

    params = Parameters.tpu_wide()
    rng = np.random.default_rng(2)
    k = 128
    blocks = [
        bytes(rng.integers(0, 256, k, dtype=np.uint8)),
        (b"model kernel feeds coder " * 10)[:k],
        b"x" * 7,
    ]
    syms = np.zeros((len(blocks), k), np.int32)
    lens = np.zeros(len(blocks), np.int32)
    for i, d in enumerate(blocks):
        syms[i, : len(d)] = np.frombuffer(d, np.uint8)
        lens[i] = len(d)
    ic = uniform_init_cum(params).astype(np.int32)
    lo, hi = model_lohi_pallas(
        jnp.asarray(syms), jnp.asarray(lens), jnp.asarray(ic), params, 16
    )
    words, blens, ovf = encode_blocks_pallas(
        lo, hi, jnp.asarray(lens), jnp.asarray(ic, dtype=jnp.int32)[-1],
        params, 64, 16,
    )
    assert not np.asarray(ovf).any()
    for i, d in enumerate(blocks):
        exp = oracle.compress_block(d, params, ic.astype(np.int64), 16)
        got = np.asarray(words)[i].astype(">u4").tobytes()[: np.asarray(blens)[i]]
        assert got == exp, i
