"""Native C++ codec vs. Python oracle — byte-identical streams, full parity."""

import numpy as np
import pytest

from redux_tpu.errors import EofError
from redux_tpu.models import AdaptiveFenwickModel
from redux_tpu.models.dense import prior_init_cum
from redux_tpu.oracle import compress_bytes as py_compress, decompress_bytes as py_decompress
from redux_tpu.params import Parameters

from conftest import corpus_file

native = pytest.importorskip("redux_tpu.native")


@pytest.mark.parametrize("freq,code", [(14, 16), (30, 32), (10, 16)])
def test_native_stream_equals_oracle(freq, code):
    p = Parameters(8, freq, code)
    data = corpus_file("calgary", "paper5").read_bytes()[:4000]
    c_native = native.compress_bytes(data, p)
    c_py = py_compress(data, AdaptiveFenwickModel(p))
    assert c_native == c_py
    assert native.decompress_bytes(c_native, p) == data
    assert py_decompress(c_native, AdaptiveFenwickModel(p)) == data


def test_native_degenerate_inputs():
    p = Parameters(8, 30, 32)
    for data in [b"", b"x", b"a" * 5000, bytes(range(256)) * 4]:
        c = native.compress_bytes(data, p)
        assert c == py_compress(data, AdaptiveFenwickModel(p))
        assert native.decompress_bytes(c, p) == data


def test_native_truncated_raises():
    p = Parameters(8, 14, 16)
    c = native.compress_bytes(b"truncate me, please " * 50, p)
    with pytest.raises(EofError):
        native.decompress_bytes(c[: len(c) // 4], p)


def test_native_known_length_decode():
    p = Parameters(8, 14, 16)
    data = b"stored-length termination" * 40
    c = native.compress_bytes(data, p)
    assert native.decompress_bytes(c, p, nsyms=len(data)) == data


def test_native_prior_matches_dense_model():
    # Warm-start prior: the native Fenwick init must match the dense-row
    # prior construction used by the JAX path.
    from redux_tpu.models.dense import DenseModel
    from redux_tpu.oracle import Codec
    from redux_tpu.bitio import BitReader, BitWriter
    import io

    p = Parameters(8, 30, 32)
    rng = np.random.default_rng(9)
    extra = rng.integers(0, 300, 257).astype(np.int64)
    extra[256] = 0
    data = corpus_file("calgary", "paper6").read_bytes()[:3000]

    # Python side: dense model with prior.
    ic = prior_init_cum(extra, p)
    out = io.BytesIO()
    codec = Codec(DenseModel(p, ic))
    w = BitWriter(out)
    codec.compress_stream(BitReader(io.BytesIO(data)), w)
    c_py = out.getvalue()

    c_native = native.compress_bytes(data, p, prior_extra=extra[:256])
    assert c_native == c_py
    assert native.decompress_bytes(c_native, p, prior_extra=extra[:256]) == data


def test_native_incompressible_roundtrip():
    p = Parameters(8, 30, 32)
    data = np.random.default_rng(1).integers(0, 256, 30000, dtype=np.uint8).tobytes()
    c = native.compress_bytes(data, p)
    assert native.decompress_bytes(c, p) == data
    assert len(c) >= len(data)


def test_generic_width_partial_tail_drops_like_reference():
    """Symbol widths that do not divide the input bit length DROP the
    partial tail symbol on compress (read_bits hits Eof mid-symbol ->
    EOF injected, codec.rs:106-109) and the partial trailing byte on
    decompress (write_bits with no final flush, codec.rs:171,
    lib.rs:113-120).  This is the REFERENCE's behavior, asserted
    identical between the oracle and the native codec — not silent
    corruption: the reference contract never round-trips sub-symbol
    tails."""
    from redux_tpu import oracle
    from redux_tpu.models.linear import AdaptiveLinearModel

    p = Parameters(16, 18, 20)
    c_o = oracle.compress_bytes(b"abc", AdaptiveLinearModel(p))
    c_n = native.compress_bytes(b"abc", p)
    assert c_o == c_n
    assert oracle.decompress_bytes(c_o, AdaptiveLinearModel(p)) == b"ab"
    assert native.decompress_bytes(c_n, p) == b"ab"
    # Widths dividing the input round-trip in full.
    p4 = Parameters(4, 10, 16)
    full = native.compress_bytes(b"abc", p4)
    assert native.decompress_bytes(full, p4) == b"abc"
