"""Property-style randomized round-trip fuzz over the public api surface.

Sweeps input sizes (empty through multi-block), content classes (text,
runs, random, structured binary), block sizes, params, and priors —
every combination must round-trip byte-exactly through BOTH
encode/decode and encode_auto/decode_auto.  Complements the corpus grid
(real files, gated) with adversarial shapes that hit block boundaries,
single-symbol inputs, and the stored-raw path.
"""

import numpy as np
import pytest

from redux_tpu import api
from redux_tpu.params import Parameters


def _contents(rng, n):
    yield "text", (b"the quick brown fox 0123456789 " * (n // 30 + 1))[:n]
    yield "runs", (b"\x00" * (n // 2) + b"\xff" * (n - n // 2))
    yield "random", rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    ramp = (np.arange(n, dtype=np.int64) * 7919 % 251).astype(np.uint8)
    yield "structured", ramp.tobytes()


SIZES = [0, 1, 2, 255, 256, 4095, 4096, 4097, 12289, 40000]


@pytest.mark.parametrize("n", SIZES)
def test_roundtrip_all_contents(n):
    rng = np.random.default_rng(n + 1)
    for label, data in _contents(rng, n):
        arc = api.encode(data)
        assert api.decode(arc) == data, (n, label)
        auto = api.encode_auto(data)
        assert api.decode_auto(auto) == data, (n, label, "auto")


@pytest.mark.parametrize("block_size", [1024, 4096, 32768])
@pytest.mark.parametrize("use_prior", [True, False])
def test_roundtrip_block_sizes(block_size, use_prior):
    rng = np.random.default_rng(block_size)
    data = rng.integers(0, 64, 10000, dtype=np.uint8).tobytes()
    arc = api.encode(data, block_size=block_size, use_prior=use_prior)
    assert api.decode(arc) == data


@pytest.mark.parametrize("params", [Parameters(8, 14, 16), Parameters(8, 15, 17),
                                    Parameters.tpu_wide()])
@pytest.mark.parametrize("delta", [1, 3, 16])
def test_roundtrip_params_grid(params, delta):
    data = (b"param grid roundtrip " * 500)[:9000]
    arc = api.encode(data, params=params, delta=delta, block_size=2048)
    assert api.decode(arc) == data


def test_compact_formats_roundtrip():
    rng = np.random.default_rng(42)
    for n in (1, 100, 5000, 70000):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        for cfg in range(len(api.container.COMPACT_CONFIGS)):
            arc = api.encode_compact(data, cfg)
            assert api.decode_compact(arc) == data, (n, cfg)
            assert api.decode_auto(arc) == data, (n, cfg)
