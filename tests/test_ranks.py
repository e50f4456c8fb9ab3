"""Parallel rank precompute vs. sequential model oracle.

The closed form in :mod:`redux_tpu.ops.ranks` must reproduce the exact
``(total_frequency, get_frequency)`` sequence of the reference models —
including the adaptation freeze (adaptive_linear.rs:34) and warm-start
priors — for every position of every block.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from redux_tpu.models import AdaptiveLinearModel, DenseModel
from redux_tpu.models.dense import prior_init_cum, uniform_init_cum
from redux_tpu.ops.ranks import precompute_encode_model, precompute_encode_model_np
from redux_tpu.params import Parameters


def _blocks(rng, n, kmax, nsym=256):
    data = [rng.integers(0, nsym, rng.integers(0, kmax + 1)).astype(np.int32) for _ in range(n)]
    k = max((len(d) for d in data), default=1) or 1
    syms = np.zeros((n, k), dtype=np.int32)
    lens = np.zeros(n, dtype=np.int32)
    for i, d in enumerate(data):
        syms[i, : len(d)] = d
        lens[i] = len(d)
    return syms, lens


@pytest.mark.parametrize("freq,code", [(14, 16), (10, 16), (30, 32)])
@pytest.mark.parametrize("chunk", [32, 128])
def test_ranks_match_numpy_oracle(freq, code, chunk):
    p = Parameters(8, freq, code)
    rng = np.random.default_rng(freq * 100 + chunk)
    syms, lens = _blocks(rng, 5, 700)
    ic = uniform_init_cum(p).astype(np.int32)
    got = precompute_encode_model(
        jnp.asarray(syms), jnp.asarray(lens), jnp.asarray(ic), p.freq_max, chunk=chunk
    )
    want = precompute_encode_model_np(syms, lens, ic, p.freq_max)
    for name, a, b in zip(["lo", "hi", "tot", "el", "eh", "et"], got, want):
        a, b = np.asarray(a), np.asarray(b)
        if a.ndim == 2:
            for i in range(len(lens)):
                assert np.array_equal(a[i, : lens[i]], b[i, : lens[i]]), (name, i)
        else:
            assert np.array_equal(a, b), name


def test_ranks_match_live_model_sequence():
    # Drive the sequential linear model over the same symbols and compare
    # the (count, low, high) triple the codec would observe at each step
    # (codec.rs:56-57).
    p = Parameters(8, 12, 16)  # small freq_max: freeze kicks in mid-block
    rng = np.random.default_rng(7)
    syms, lens = _blocks(rng, 3, 900)
    ic = uniform_init_cum(p).astype(np.int32)
    lo, hi, tot, el, eh, et = (
        np.asarray(x)
        for x in precompute_encode_model(
            jnp.asarray(syms), jnp.asarray(lens), jnp.asarray(ic), p.freq_max
        )
    )
    for b in range(len(lens)):
        m = AdaptiveLinearModel(p)
        for t in range(lens[b]):
            count = m.total_frequency()
            low_f, high_f = m.get_frequency(int(syms[b, t]))
            assert (tot[b, t], lo[b, t], hi[b, t]) == (count, low_f, high_f), (b, t)
        count = m.total_frequency()
        low_f, high_f = m.get_frequency(p.symbol_eof)
        assert (et[b], el[b], eh[b]) == (count, low_f, high_f), b


def test_ranks_with_warm_start_prior():
    p = Parameters(8, 30, 32)
    rng = np.random.default_rng(11)
    syms, lens = _blocks(rng, 4, 500)
    extra = rng.integers(0, 50, p.symbol_count).astype(np.int64)
    extra[p.symbol_eof] = 0
    ic = prior_init_cum(extra, p).astype(np.int32)
    lo, hi, tot, el, eh, et = (
        np.asarray(x)
        for x in precompute_encode_model(
            jnp.asarray(syms), jnp.asarray(lens), jnp.asarray(ic), p.freq_max
        )
    )
    for b in range(len(lens)):
        m = DenseModel(p, ic.astype(np.int64))
        for t in range(lens[b]):
            count = m.total_frequency()
            low_f, high_f = m.get_frequency(int(syms[b, t]))
            assert (tot[b, t], lo[b, t], hi[b, t]) == (count, low_f, high_f), (b, t)
        count = m.total_frequency()
        low_f, high_f = m.get_frequency(p.symbol_eof)
        assert (et[b], el[b], eh[b]) == (count, low_f, high_f), b


def test_fused_model_values_match_rank_formulation():
    """The production fused path (_model_values_parallel: precombined
    T_lo/T_hi tables, one shared equality mask) against the original
    two-rank formulation (_ranks_parallel) on random symbol streams with
    freeze cutoffs — the two derivations must agree everywhere."""
    import jax.numpy as jnp

    from redux_tpu.ops.ranks import _model_values_parallel, _ranks_parallel

    rng = np.random.default_rng(17)
    B, Kp, chunk, n_symbols, delta = 6, 256, 64, 257, 3
    syms = rng.integers(0, 256, (B, Kp), dtype=np.int32)
    limit = np.array([0, 1, 63, 64, 200, 256], dtype=np.int32)
    init_cum = np.arange(n_symbols + 1, dtype=np.int32) * 2  # any monotone row
    c, d = _ranks_parallel(jnp.asarray(syms), jnp.asarray(limit), n_symbols, chunk)
    lo, hi = _model_values_parallel(
        jnp.asarray(syms), jnp.asarray(limit), jnp.asarray(init_cum),
        n_symbols, chunk, delta,
    )
    c, d, lo, hi = (np.asarray(x) for x in (c, d, lo, hi))
    exp_lo = init_cum[syms] + delta * c
    exp_hi = init_cum[syms + 1] + delta * (c + d)
    np.testing.assert_array_equal(lo, exp_lo)
    np.testing.assert_array_equal(hi, exp_hi)
