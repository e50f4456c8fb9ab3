"""Golden reference-format streams: the format can never drift silently.

The fixtures in tests/golden/ were produced by the native C++ port of the
reference codec (same algorithm as /root/reference/src/codec.rs; the
bit-level format itself is locked by the transcribed bitio golden vectors
in tests/test_bitio.py).  Every implementation — oracle, native, and the
vectorized coder — must reproduce them byte-for-byte and decode them
back, standing in for "reference-produced archives decode byte-exactly"
(BASELINE.md) in an environment without a Rust toolchain.
"""

import pathlib

import pytest

from redux_tpu import native, oracle
from redux_tpu.models import AdaptiveFenwickModel
from redux_tpu.params import Parameters

GOLDEN = pathlib.Path(__file__).parent / "golden"

CASES = [
    ("paper5_8_30_32.rdx", ("calgary", "paper5"), None, Parameters.default()),
    ("alphabet_8_14_16.rdx", ("artificial", "alphabet.txt"), 4096, Parameters(8, 14, 16)),
    ("a_8_30_32.rdx", ("artificial", "a.txt"), None, Parameters.default()),
    ("random4k_8_22_24.rdx", ("artificial", "random.txt"), 4096, Parameters(8, 22, 24)),
]


def _case(fixture, src, limit):
    from conftest import corpus_file

    data = corpus_file(*src).read_bytes()
    if limit:
        data = data[:limit]
    return data, (GOLDEN / fixture).read_bytes()


@pytest.mark.parametrize("fixture,src,limit,params", CASES)
def test_native_matches_golden(fixture, src, limit, params):
    data, golden = _case(fixture, src, limit)
    assert native.compress_bytes(data, params) == golden
    assert native.decompress_bytes(golden, params) == data


@pytest.mark.parametrize("fixture,src,limit,params", CASES[1:3])
def test_oracle_matches_golden(fixture, src, limit, params):
    data, golden = _case(fixture, src, limit)
    model = AdaptiveFenwickModel(params)
    assert oracle.compress_bytes(data, model) == golden
    assert oracle.decompress_bytes(golden, AdaptiveFenwickModel(params)) == data
