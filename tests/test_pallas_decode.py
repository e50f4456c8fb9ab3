"""Differential tests: Pallas decode kernel vs the sequential v2 oracle.

On CPU the kernel runs in Pallas interpreter mode — identical semantics
to the Mosaic-compiled TPU path, so these tests pin the kernel's
bit-level behavior without TPU hardware.
"""

import io

import numpy as np
import pytest

from redux_tpu import oracle
from redux_tpu.models.dense import prior_init_cum, uniform_init_cum
from redux_tpu.ops.coder import bytes_to_words_device
from redux_tpu.ops.pallas_decode import decode_blocks_pallas
from redux_tpu.params import Parameters

import jax.numpy as jnp


def _encode_blocks_oracle(blocks, params, init_cum, delta):
    return [oracle.compress_block(b, params, init_cum.astype(np.int64), delta) for b in blocks]


def _to_words(streams, extra_words=4):
    wn = max((len(s) + 3) // 4 for s in streams) + extra_words
    byts = np.zeros((len(streams), wn * 4), dtype=np.uint8)
    for i, s in enumerate(streams):
        byts[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    return np.asarray(bytes_to_words_device(jnp.asarray(byts)))


def _roundtrip(blocks, params, init_cum, delta, k):
    streams = _encode_blocks_oracle(blocks, params, init_cum, delta)
    words = _to_words(streams)
    lens = np.array([len(b) for b in blocks], dtype=np.int32)
    got = np.asarray(
        decode_blocks_pallas(
            jnp.asarray(words), jnp.asarray(lens), jnp.asarray(init_cum), params, k, delta
        )
    )
    for i, b in enumerate(blocks):
        np.testing.assert_array_equal(
            got[i, : len(b)], np.frombuffer(b, dtype=np.uint8), err_msg=f"block {i}"
        )


def test_wide_config_random_and_text():
    params = Parameters.tpu_wide()
    rng = np.random.default_rng(0)
    k = 512
    blocks = [
        bytes(rng.integers(0, 256, k, dtype=np.uint8)),  # incompressible
        bytes([65] * k),  # degenerate single symbol
        (b"the quick brown fox jumps over the lazy dog. " * 20)[:k],
        bytes(rng.integers(0, 4, k, dtype=np.uint8)),  # tiny alphabet
        b"x",  # 1-byte block
        bytes(rng.integers(0, 256, 77, dtype=np.uint8)),  # short block
    ]
    ic = uniform_init_cum(params).astype(np.int32)
    _roundtrip(blocks, params, ic, delta=16, k=k)


def test_u32_config_delta1():
    params = Parameters.tpu32()
    rng = np.random.default_rng(1)
    k = 300
    blocks = [
        bytes(rng.integers(0, 256, k, dtype=np.uint8)),
        (b"abcabcabd" * 40)[:k],
    ]
    ic = uniform_init_cum(params).astype(np.int32)
    _roundtrip(blocks, params, ic, delta=1, k=k)


def test_prior_init_and_freeze():
    """Warm-start prior + a freq cap small enough to freeze mid-block."""
    params = Parameters(8, 20, 22)
    rng = np.random.default_rng(2)
    k = 400
    data = (b"aaabbbcccddd" * 200)[:k]
    hist = np.bincount(np.frombuffer(data, np.uint8), minlength=256)
    from redux_tpu.models.dense import quantize_prior

    extra = quantize_prior(hist, params, 4096)
    full = np.zeros(params.symbol_count, dtype=np.int64)
    full[: extra.shape[0]] = extra
    ic = prior_init_cum(full, params).astype(np.int32)
    blocks = [data, bytes(rng.integers(0, 256, k, dtype=np.uint8))]
    _roundtrip(blocks, params, ic, delta=64, k=k)  # delta*k drives toward cap


def test_many_lanes_cross_tile():
    """> 128 blocks exercises the lane-tile grid dimension."""
    params = Parameters.tpu_wide()
    rng = np.random.default_rng(3)
    k = 96
    blocks = [bytes(rng.integers(0, 256, rng.integers(1, k + 1), dtype=np.uint8)) for _ in range(131)]
    ic = uniform_init_cum(params).astype(np.int32)
    _roundtrip(blocks, params, ic, delta=16, k=k)


def test_divergent_rates_slab_refill():
    """Mix incompressible and constant blocks: maximal cursor divergence,
    exercising the dynamic-span slab refill across many slabs."""
    params = Parameters.tpu_wide()
    rng = np.random.default_rng(4)
    k = 4096
    blocks = [
        bytes(rng.integers(0, 256, k, dtype=np.uint8)),  # ~8 KB stream
        bytes([7] * k),  # ~tens of bytes
        bytes(rng.integers(0, 16, k, dtype=np.uint8)),
        (b"z" * 100 + bytes(rng.integers(0, 256, 100, dtype=np.uint8))) * 20,
    ]
    blocks[3] = blocks[3][:k]
    ic = uniform_init_cum(params).astype(np.int32)
    _roundtrip(blocks, params, ic, delta=16, k=k)


@pytest.mark.parametrize("mode", ["bucket", "bucketsplit"])
def test_bucket_sweep_matches_oracle(monkeypatch, mode):
    """The production TWO-LEVEL sweep (hardware default) on the
    interpreter: coarse row maintenance, the fused update-landing /
    window-select pass, and the coarse-min fhi fallback (lc == BS) all
    run — including a freeze-overshoot config (delta * k past freq_max)
    and degenerate single-symbol blocks whose bucket never changes.
    The distinct k keeps the jit cache from reusing a full-sweep
    compile."""
    monkeypatch.setenv("REDUX_TPU_DECODE_SWEEP", mode)
    monkeypatch.setenv("REDUX_TPU_WSEL", "4")  # split select chains variant
    params = Parameters(8, 20, 22)
    rng = np.random.default_rng(7)
    k = 160
    data = (b"aaabbbcccddd" * 100)[:k]
    hist = np.bincount(np.frombuffer(data, np.uint8), minlength=256)
    from redux_tpu.models.dense import quantize_prior

    extra = quantize_prior(hist, params, 4096)
    full = np.zeros(params.symbol_count, dtype=np.int64)
    full[: extra.shape[0]] = extra
    ic = prior_init_cum(full, params).astype(np.int32)
    blocks = [
        data,
        bytes(rng.integers(0, 256, k, dtype=np.uint8)),
        bytes([0] * k),  # bucket 0 forever; lc == BS fallback at row 0 ties
        bytes([255] * k),  # last data bucket
        bytes(rng.integers(250, 256, k, dtype=np.uint8)),  # top-bucket mix
        b"\xff",
    ]
    _roundtrip(blocks, params, ic, delta=64, k=k)  # delta*k overshoots cap


def test_two_phase_interleave_matches_oracle(monkeypatch):
    """The production TPU kernel config on the interpreter: phases=2 (two
    independent lane tiles interleaved in one program) + the chunked
    sweep — same bitstream contract, including an ODD tile count that
    forces the internal phase padding.  The env var must be set because
    interpret mode defaults to the (bit-identical) full-mask sweep; the
    distinct (k, phases) keeps the jit cache from reusing a full-sweep
    compile."""
    monkeypatch.setenv("REDUX_TPU_DECODE_SWEEP", "chunk")
    monkeypatch.setenv("REDUX_TPU_DECODE_ACCW", "2")  # split accumulators
    params = Parameters.tpu_wide()
    rng = np.random.default_rng(5)
    k = 96
    ic = uniform_init_cum(params)
    # 3 tiles of the conftest-pinned 128-lane width: 300 blocks pad to
    # 384 lanes -> t_pad = 4 tiles, phase B's last tile fully masked.
    blocks = []
    for i in range(300):
        n = int(rng.integers(1, k + 1))
        src = rng.integers(0, 256 if i % 3 else 7, n, dtype=np.uint8)
        blocks.append(bytes(src))
    streams = _encode_blocks_oracle(blocks, params, ic, 16)
    words = _to_words(streams)
    lens = np.array([len(b) for b in blocks], dtype=np.int32)
    got = np.asarray(
        decode_blocks_pallas(
            jnp.asarray(words), jnp.asarray(lens), jnp.asarray(ic), params,
            k, 16, phases=2,
        )
    )
    for i, b in enumerate(blocks):
        np.testing.assert_array_equal(
            got[i, : len(b)], np.frombuffer(b, dtype=np.uint8), err_msg=f"block {i}"
        )
