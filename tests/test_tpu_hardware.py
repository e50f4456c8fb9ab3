"""Compiled-mode (Mosaic) kernel coverage on real TPU hardware.

The CPU test tiers exercise the Pallas kernels in interpret mode — the
same semantics, but Mosaic-specific constructs (SMEM scalar gates,
sublane-packed layouts, statically-unrolled sweeps) only compile on
hardware.  This test round-trips the production kernels in COMPILED mode
through a subprocess that targets the real backend.

AUTO-ENABLED when the machine has an accelerator (the conftest stashes
the pre-pin JAX_PLATFORMS in REDUX_TPU_ORIG_PLATFORMS; a non-cpu value
means a real backend is configured) — Mosaic-only regressions must not
ship untested when hardware is right there.  Force with
REDUX_TPU_HW_TESTS=1, or skip with REDUX_TPU_HW_TESTS=0 (first compile
of the test shapes takes minutes on a cold cache).
"""

import os
import subprocess
import sys

import pytest

_DRIVER = r"""
import numpy as np, jax
assert jax.default_backend() not in ("cpu",), jax.default_backend()
import jax.numpy as jnp
from redux_tpu.models.dense import uniform_init_cum
from redux_tpu.ops.pallas_decode import decode_blocks_pallas
from redux_tpu.ops.pallas_encode import encode_blocks_pallas_m, encode_blocks_ranked
from redux_tpu import oracle
from redux_tpu.params import Parameters

params = Parameters.tpu_wide()
rng = np.random.default_rng(0)
k = 512
blocks = [
    bytes(rng.integers(0, 256, k, dtype=np.uint8)),
    (b"compiled-mode kernel coverage " * 40)[:k],
    b"tiny",
]
b = len(blocks)
syms = np.zeros((b, k), dtype=np.int32)
lens = np.zeros(b, dtype=np.int32)
for i, d in enumerate(blocks):
    syms[i, : len(d)] = np.frombuffer(d, np.uint8)
    lens[i] = len(d)
ic = uniform_init_cum(params).astype(np.int32)
n_words = k // 2  # generous: the random block expands (~13%) and must fit

for name, enc in (("ranked", encode_blocks_ranked), ("m-kernel", encode_blocks_pallas_m)):
    words, blens, ovf = enc(jnp.asarray(syms), jnp.asarray(lens), jnp.asarray(ic),
                            params, n_words, 16)
    words, blens = np.asarray(words), np.asarray(blens)
    assert not np.asarray(ovf).any(), name
    for i, d in enumerate(blocks):
        exp = oracle.compress_block(d, params, ic.astype(np.int64), 16)
        got = words[i].astype(">u4").tobytes()[: blens[i]]
        assert got == exp, (name, i, len(got), len(exp))
    dec = np.asarray(decode_blocks_pallas(
        jnp.asarray(words), jnp.asarray(lens), jnp.asarray(ic), params, k, 16))
    for i, d in enumerate(blocks):
        assert dec[i, : lens[i]].astype(np.uint8).tobytes() == d, (name, i)
print("TPU compiled-mode kernels: bit-exact")
"""


def _hardware_available() -> bool:
    """True when the suite should drive the real accelerator backend."""
    forced = os.environ.get("REDUX_TPU_HW_TESTS")
    if forced is not None:
        return forced not in ("", "0")
    orig = os.environ.get("REDUX_TPU_ORIG_PLATFORMS", "")
    return bool(orig) and orig != "cpu"


@pytest.mark.skipif(
    not _hardware_available(),
    reason="no accelerator backend configured (REDUX_TPU_HW_TESTS=1 forces)",
)
def test_compiled_kernels_bit_exact_on_hardware():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # use the real backend, not the test CPU pin
    env.pop("REDUX_TPU_LANES", None)
    env.pop("REDUX_TPU_DLANES", None)
    # PREPEND the repo: the TPU plugin may be provided via an existing
    # PYTHONPATH entry (e.g. a sitecustomize), which must be preserved.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", _DRIVER], env=env, capture_output=True, text=True,
        timeout=1800,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "bit-exact" in out.stdout


_LARGE_DRIVER = r"""
import numpy as np, time, jax
assert jax.default_backend() not in ("cpu",), jax.default_backend()
from redux_tpu import api, container

rng = np.random.default_rng(1)
base = bytearray()
import os
d = "/root/reference/resources/calgary"
for name in sorted(os.listdir(d)):
    base += open(os.path.join(d, name), "rb").read()
rep = (256 * (1 << 20)) // len(base) + 1
data = bytes(base * rep)[: 256 * (1 << 20)]
t0 = time.time()
arc = api.encode(data)
t_enc = time.time() - t0
t0 = time.time()
out = api.decode(arc)
t_dec = time.time() - t0
assert out == data
stats = {}
try:
    stats = jax.local_devices()[0].memory_stats() or {}
except Exception:
    pass
peak = stats.get("peak_bytes_in_use", 0)
print(f"large-input OK: {len(data)} -> {len(arc)} bytes, "
      f"enc {len(data)/t_enc/1e9:.3f} GB/s e2e, dec {len(data)/t_dec/1e9:.3f} GB/s e2e, "
      f"peak HBM {peak/1e9:.2f} GB" if peak else
      f"large-input OK: {len(data)} -> {len(arc)} bytes, "
      f"enc {len(data)/t_enc/1e9:.3f} GB/s e2e, dec {len(data)/t_dec/1e9:.3f} GB/s e2e, "
      f"peak HBM unavailable on this backend")
"""


@pytest.mark.slow
@pytest.mark.skipif(
    not _hardware_available(),
    reason="no accelerator backend configured (REDUX_TPU_HW_TESTS=1 forces)",
)
def test_large_input_chunked_encode_decode_roundtrip():
    """>= 256 MB through api.encode AND api.decode on hardware: both
    lane-chunked paths forced to 4+ chunks (REDUX_TPU_ENC_CHUNK_MB /
    REDUX_TPU_DEC_CHUNK_MB = 64) so the rank planes, the decode staging
    matrix, and the output planes all stay bounded; bit-exact
    round-trip; peak HBM printed when the backend reports it.
    BASELINE.json configs[3] (enwik-scale) stand-in — the mount's large
    blob (E.coli) is stripped."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("REDUX_TPU_LANES", None)
    env.pop("REDUX_TPU_DLANES", None)
    env["REDUX_TPU_ENC_CHUNK_MB"] = "64"
    env["REDUX_TPU_DEC_CHUNK_MB"] = "64"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", _LARGE_DRIVER], env=env, capture_output=True,
        text=True, timeout=3000,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "large-input OK" in out.stdout, out.stdout
    print(out.stdout.strip())


_FUZZ_DRIVER = r"""
import numpy as np, jax
assert jax.default_backend() not in ("cpu",), jax.default_backend()
import jax.numpy as jnp
from redux_tpu import oracle
from redux_tpu.models.dense import uniform_init_cum
from redux_tpu.ops.pallas_decode import decode_blocks_pallas
from redux_tpu.ops.pallas_encode import encode_blocks_ranked
from redux_tpu.params import Parameters

params = Parameters.tpu_wide()
rng = np.random.default_rng(7)
k, nb, delta = 512, 8, 16
ic = uniform_init_cum(params).astype(np.int32)
icj = jnp.asarray(ic)
for trial in range(10):
    blocks = []
    for _ in range(nb):
        kind = rng.integers(0, 5)
        n = int(rng.integers(1, k + 1)) if rng.integers(0, 3) == 0 else k
        if kind == 0: b = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        elif kind == 1: b = bytes([int(rng.integers(0, 256))] * n)
        elif kind == 2: b = bytes(rng.integers(0, 9, n, dtype=np.uint8))
        elif kind == 3: b = bytes(((np.arange(n) * 8 + rng.integers(-1, 2, n)) % 256).astype(np.uint8))
        else: b = bytes(rng.integers(248, 256, n, dtype=np.uint8))
        blocks.append(b)
    syms = np.zeros((nb, k), np.int32); lens = np.zeros(nb, np.int32)
    for i, d in enumerate(blocks):
        syms[i, : len(d)] = np.frombuffer(d, np.uint8); lens[i] = len(d)
    words, blens, ovf = encode_blocks_ranked(
        jnp.asarray(syms), jnp.asarray(lens), icj, params, k // 2, delta)
    words_np, blens_np = np.asarray(words), np.asarray(blens)
    assert not np.asarray(ovf).any(), trial
    for i, d in enumerate(blocks):
        exp = oracle.compress_block(d, params, ic.astype(np.int64), delta)
        got = words_np[i].astype(">u4").tobytes()[: blens_np[i]]
        assert got == exp, ("encode", trial, i)
    dec = np.asarray(decode_blocks_pallas(
        jnp.asarray(words_np), jnp.asarray(lens), icj, params, k, delta))
    for i, d in enumerate(blocks):
        assert dec[i, : lens[i]].astype(np.uint8).tobytes() == d, ("decode", trial, i)
print("hardware content-fuzz: bit-exact")
"""


@pytest.mark.slow
@pytest.mark.skipif(
    not _hardware_available(),
    reason="no accelerator backend configured (REDUX_TPU_HW_TESTS=1 forces)",
)
def test_compiled_kernels_content_fuzz():
    """Random-content differential sweep in COMPILED Mosaic mode: 10
    trials x 8 mixed blocks (random / constant / tiny-alphabet /
    bucket-boundary-heavy / top-bucket) vs the oracle, bit-exact both
    directions.  Same shapes as the bit-exact test above, so the kernel
    compiles are shared via the persistent cache."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("REDUX_TPU_LANES", None)
    env.pop("REDUX_TPU_DLANES", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", _FUZZ_DRIVER], env=env, capture_output=True,
        text=True, timeout=1800,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "bit-exact" in out.stdout
