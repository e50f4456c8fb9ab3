"""compact_flushed_words vs a numpy mirror — production-depth coverage.

Targets the int16-displacement overflow class of bug (ADVICE.md r1): the
compaction's displacement range and phase count are K-dependent, so it is
exercised here at the production block size (T = 65537 steps) and at
pathological valid/invalid patterns, without paying for the full encoder
scan on CPU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from redux_tpu.ops.coder import compact_flushed_words


def _compact_np(ws0, ws1, nv, n_words):
    """Obvious sequential mirror: per lane, concatenate valid words in order."""
    T, B = nv.shape
    out = np.zeros((n_words, B), dtype=np.uint32)
    counts = np.zeros(B, dtype=np.int32)
    for b in range(B):
        words = []
        for t in range(T):
            if nv[t, b] >= 1:
                words.append(ws0[t, b])
            if nv[t, b] >= 2:
                words.append(ws1[t, b])
        counts[b] = len(words)
        w = np.asarray(words[:n_words], dtype=np.uint32)
        out[: len(w), b] = w
    return out, counts


def _run(ws0, ws1, nv, n_words):
    got, nw = compact_flushed_words(
        jnp.asarray(ws0), jnp.asarray(ws1), jnp.asarray(nv), n_words
    )
    got, nw = np.asarray(got), np.asarray(nw)
    exp, counts = _compact_np(ws0, ws1, nv, n_words)
    assert np.array_equal(nw, counts)
    # Only rows < count per lane are defined.
    for b in range(nv.shape[1]):
        n = min(counts[b], n_words)
        assert np.array_equal(got[:n, b], exp[:n, b]), f"lane {b}"


@pytest.mark.parametrize("T", [1, 7, 4097, 65537])
def test_compaction_random(T):
    rng = np.random.default_rng(T)
    B = 5
    # Realistic density: ~1 word per 6-50 steps, plus a dense lane (delta
    # small) and a sparse lane (delta huge — the int16 overflow regime).
    nv = np.zeros((T, B), dtype=np.int8)
    nv[:, 0] = (rng.random(T) < 0.2).astype(np.int8)  # ~compressible text
    nv[:, 1] = (rng.random(T) < 0.02).astype(np.int8)  # highly compressible
    nv[:, 2] = 1  # incompressible: every step flushes
    nv[T // 2 :, 3] = (rng.random(T - T // 2) < 0.5).astype(np.int8) * 2
    # lane 4 stays all-zero (empty block)
    ws0 = rng.integers(0, 1 << 32, (T, B), dtype=np.uint32)
    ws1 = rng.integers(0, 1 << 32, (T, B), dtype=np.uint32)
    ws0 = np.where(nv >= 1, ws0, 0)
    ws1 = np.where(nv >= 2, ws1, 0)
    n_words = int(nv.astype(np.int32).sum(axis=0).max()) + 3
    _run(ws0, ws1, nv, n_words)


def test_compaction_max_delta_at_production_size():
    """One word at the very last step of T=65537: delta = 2T-2 ≈ 131072."""
    T, B = 65537, 2
    nv = np.zeros((T, B), dtype=np.int8)
    nv[-1, 0] = 2
    nv[0, 1] = 1
    nv[-1, 1] = 1
    ws0 = np.where(nv >= 1, np.uint32(0xDEADBEEF), np.uint32(0))
    ws1 = np.where(nv >= 2, np.uint32(0xCAFEF00D), np.uint32(0))
    _run(ws0, ws1, nv, 8)
