"""Generic (user-defined) device-path models — differential tests.

The reference's ``Model`` trait (lib.rs:14-15, model/mod.rs:17-29) lets
users plug arbitrary adaptive models into the codec.  ``ops.generic``
carries that extension point onto the jit device path; these tests pin it
three ways:

1. the built-in dense ``JaxModel`` reproduces the specialized production
   coders bit-for-bit (generic == ranks+encode_blocks == oracle);
2. a frozen static-distribution model — a rule the production kernels
   cannot express — matches a host ``Model`` twin through the oracle;
3. a custom two-speed adaptive model (per-symbol increment) likewise
   matches its host twin, and both custom models round-trip.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from redux_tpu.models.base import Model
from redux_tpu.models.dense import uniform_init_cum
from redux_tpu.oracle import compress_bytes
from redux_tpu.ops.bitpack import streams_to_words, words_to_streams
from redux_tpu.ops.coder import decode_blocks, encode_blocks, max_block_words
from redux_tpu.ops.generic import (
    decode_blocks_generic,
    dense_jax_model,
    encode_blocks_generic,
    make_generic_coders,
    static_jax_model,
)
from redux_tpu.ops.ranks import precompute_encode_model
from redux_tpu.params import Parameters

from conftest import corpus_file


def _blocks():
    book1 = corpus_file("calgary", "book1").read_bytes()
    rng = np.random.default_rng(11)
    return [
        book1[:400],
        b"",
        b"\x00" * 300,
        bytes(range(256)),
        rng.integers(0, 256, 350, dtype=np.uint8).tobytes(),
        b"abracadabra" * 30,
    ]


def _stage(blocks):
    b = len(blocks)
    k = max(max((len(d) for d in blocks), default=1), 1)
    syms = np.zeros((b, k), dtype=np.int32)
    lens = np.array([len(d) for d in blocks], dtype=np.int32)
    for i, d in enumerate(blocks):
        syms[i, : len(d)] = np.frombuffer(d, dtype=np.uint8)
    return jnp.asarray(syms), jnp.asarray(lens), k


class _CumHostModel(Model):
    """Host twin base: cumulative-row model with a pluggable increment."""

    def __init__(self, params, cum):
        self.params = params
        self.cum = [int(x) for x in cum]  # Python ints: exact u64 products

    def _inc(self, symbol: int) -> int:
        raise NotImplementedError

    def _update(self, symbol: int) -> None:
        if self.total_frequency() < self.params.freq_max:
            d = self._inc(symbol)
            for i in range(symbol + 1, len(self.cum)):
                self.cum[i] += d

    def total_frequency(self) -> int:
        return self.cum[self.params.symbol_count]

    def get_frequency(self, symbol):
        res = (self.cum[symbol], self.cum[symbol + 1])
        self._update(symbol)
        return res

    def get_symbol(self, value):
        for i in range(len(self.cum) - 1):
            if value < self.cum[i + 1]:
                res = (i, self.cum[i], self.cum[i + 1])
                self._update(i)
                return res
        raise AssertionError("value out of range")

    def get_freq_table(self):
        return [
            (self.cum[i], self.cum[i + 1])
            for i in range(self.params.symbol_count)
        ]


class _StaticHost(_CumHostModel):
    def _update(self, symbol):
        pass


class _TwoSpeedHost(_CumHostModel):
    """Per-symbol adaptation speed: +4 for bytes < 128, +1 otherwise."""

    def _inc(self, symbol):
        return 4 if symbol < 128 else 1


GENERIC_CONFIGS = [
    Parameters(8, 14, 16),  # u32 path
    Parameters(8, 30, 32),  # production widths; i64 path
]


@pytest.mark.parametrize(
    "params", GENERIC_CONFIGS, ids=lambda p: f"{p.symbol_bits}-{p.freq_bits}-{p.code_bits}"
)
@pytest.mark.parametrize("delta", [1, 16])
def test_dense_generic_matches_specialized(params, delta):
    blocks = _blocks()
    syms, lens, k = _stage(blocks)
    ic = uniform_init_cum(params).astype(np.int32)
    w = max_block_words(min(257 + delta * k, params.freq_max), params.symbol_count, params, k)

    model = dense_jax_model(params, ic, delta=delta)
    gw, gl = encode_blocks_generic(syms, lens, model, params, w)
    pre = precompute_encode_model(syms, lens, jnp.asarray(ic), params.freq_max, delta=delta)
    sw, sl = encode_blocks(*pre, lens, params, w)
    assert np.array_equal(np.asarray(gl), np.asarray(sl))
    assert np.array_equal(np.asarray(gw), np.asarray(sw))

    dec_g = np.asarray(decode_blocks_generic(gw, lens, model, params, k))
    dec_s = np.asarray(decode_blocks(gw, lens, jnp.asarray(ic), params, k, delta=delta))
    assert np.array_equal(dec_g, dec_s.astype(dec_g.dtype))
    for i, d in enumerate(blocks):
        assert bytes(dec_g[i, : lens[i]].astype(np.uint8)) == d


def _skewed_cum(params):
    """A deliberately non-uniform static distribution (ASCII-heavy)."""
    freqs = np.ones(params.symbol_count, dtype=np.int64)
    freqs[32:127] = 40
    freqs[ord("a") : ord("z") + 1] = 200
    cum = np.zeros(params.symbol_count + 1, dtype=np.int64)
    np.cumsum(freqs, out=cum[1:])
    assert cum[-1] <= params.freq_max
    return cum.astype(np.int32)


@pytest.mark.parametrize(
    "params", GENERIC_CONFIGS, ids=lambda p: f"{p.symbol_bits}-{p.freq_bits}-{p.code_bits}"
)
def test_static_model_matches_host_oracle(params):
    blocks = _blocks()
    syms, lens, k = _stage(blocks)
    cum = _skewed_cum(params)
    w = max_block_words(int(cum[-1]), params.symbol_count, params, k)

    model = static_jax_model(params, cum)
    enc, dec = make_generic_coders(model, params)
    words, byte_lens = enc(syms, lens, w)
    streams = words_to_streams(np.asarray(words), np.asarray(byte_lens))
    refs = [compress_bytes(d, _StaticHost(params, cum)) for d in blocks]
    for i, (s, r) in enumerate(zip(streams, refs)):
        assert s == r, f"block {i}: static generic stream != host oracle"

    decoded = np.asarray(dec(streams_to_words(streams, w), lens, k))
    for i, d in enumerate(blocks):
        assert bytes(decoded[i, : lens[i]].astype(np.uint8)) == d


@pytest.mark.parametrize(
    "params", GENERIC_CONFIGS, ids=lambda p: f"{p.symbol_bits}-{p.freq_bits}-{p.code_bits}"
)
def test_two_speed_model_matches_host_oracle(params):
    blocks = _blocks()
    syms, lens, k = _stage(blocks)
    ic = uniform_init_cum(params).astype(np.int32)
    w = max_block_words(min(257 + 4 * (k + 1), params.freq_max), params.symbol_count, params, k)

    base = dense_jax_model(params, ic, delta=4)  # reuse lookups/sentinel
    S = params.symbol_count
    freq_max = params.freq_max

    def update(cum, sym, active):
        upd = active & (cum[:, S] < freq_max)
        inc = jnp.where(sym < 128, jnp.int32(4), jnp.int32(1))
        mask = jnp.arange(S + 1, dtype=jnp.int32)[None, :] > sym[:, None]
        return cum + jnp.where(mask & upd[:, None], inc[:, None], 0)

    model = base._replace(update=update)
    enc, dec = make_generic_coders(model, params)
    words, byte_lens = enc(syms, lens, w)
    streams = words_to_streams(np.asarray(words), np.asarray(byte_lens))
    refs = [compress_bytes(d, _TwoSpeedHost(params, ic)) for d in blocks]
    for i, (s, r) in enumerate(zip(streams, refs)):
        assert s == r, f"block {i}: two-speed generic stream != host oracle"

    # Decode the HOST oracle's streams with the device generic decoder.
    decoded = np.asarray(dec(streams_to_words(refs, w), lens, k))
    for i, d in enumerate(blocks):
        assert bytes(decoded[i, : lens[i]].astype(np.uint8)) == d
