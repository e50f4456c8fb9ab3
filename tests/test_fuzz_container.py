"""Container fuzz: corrupted archives must always raise, never lie.

The reference surfaces truncation as Error::Eof mid-decode
(bitio/mod.rs:106-108) but bit flips are silent there.  The RXT container
carries a crc32 of the original data (container.py), so EVERY corruption
— truncation anywhere, any single bit flip, or garbage — must raise
ReduxError (usually InvalidInputError); returning wrong bytes is the one
forbidden outcome.
"""

import numpy as np
import pytest

from redux_tpu import api
from redux_tpu.errors import ReduxError


@pytest.fixture(scope="module")
def archive():
    rng = np.random.default_rng(7)
    base = (b"the quick brown fox jumps over the lazy dog. " * 400)[:16000]
    noise = rng.integers(0, 256, 4000, dtype=np.uint8).tobytes()
    data = base + noise
    return data, api.encode(data, block_size=4096)


def _expect_error_or_exact(data, corrupted):
    try:
        out = api.decode(bytes(corrupted))
    except ReduxError:
        return
    except (ValueError, struct_error):  # pragma: no cover - never expected
        raise
    assert out == data, "corruption returned WRONG bytes without an error"


struct_error = Exception


def test_truncation_everywhere(archive):
    data, arc = archive
    # Every truncation length: header region densely, payload strided.
    lengths = list(range(0, 64)) + list(range(64, len(arc), 97))
    for n in lengths:
        _expect_error_or_exact(data, arc[:n])


def test_single_bit_flips(archive):
    data, arc = archive
    rng = np.random.default_rng(11)
    buf = np.frombuffer(arc, dtype=np.uint8).copy()
    # All header bytes + random payload positions.
    positions = list(range(min(64, len(arc)))) + [
        int(p) for p in rng.integers(0, len(arc), 120)
    ]
    for pos in positions:
        for bit in (0, 3, 7):
            c = buf.copy()
            c[pos] ^= 1 << bit
            _expect_error_or_exact(data, c.tobytes())


def test_random_garbage(archive):
    data, arc = archive
    rng = np.random.default_rng(13)
    for n in (0, 1, 4, 31, 32, 33, 200):
        _expect_error_or_exact(data, rng.integers(0, 256, n, dtype=np.uint8).tobytes())
    # Valid magic followed by garbage.
    g = b"RXT1" + rng.integers(0, 256, 100, dtype=np.uint8).tobytes()
    _expect_error_or_exact(data, g)
