"""Multi-device (8 virtual CPU devices) sharded codec tests.

Validates the multi-chip dp path: shard_map'ed encode/decode over a 1-D
mesh produces bit-identical streams to the single-device oracle, with
lanes partitioned across devices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from redux_tpu.models.dense import uniform_init_cum
from redux_tpu.oracle import compress_block
from redux_tpu.ops import coder
from redux_tpu.ops.bitpack import streams_to_words, words_to_streams
from redux_tpu.ops.ranks import precompute_encode_model
from redux_tpu.parallel import (
    data_parallel_mesh,
    decode_blocks_sharded,
    encode_blocks_sharded,
    pad_to_devices,
)
from redux_tpu.params import Parameters

from conftest import corpus_file

K = 512
DELTA = 4


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    return data_parallel_mesh()


def _prep(params, n_blocks=16, k=K):
    data = corpus_file("calgary", "news").read_bytes()
    blocks = [data[i * k : (i + 1) * k] for i in range(n_blocks)]
    blocks[-1] = blocks[-1][: k // 3]  # ragged tail
    syms = np.zeros((n_blocks, k), dtype=np.int32)
    lens = np.zeros(n_blocks, dtype=np.int32)
    for i, d in enumerate(blocks):
        syms[i, : len(d)] = np.frombuffer(d, dtype=np.uint8)
        lens[i] = len(d)
    ic = uniform_init_cum(params).astype(np.int32)
    return blocks, syms, lens, ic


def _encode_model(params, syms, lens, ic):
    lo, hi, tot, _, _, _ = precompute_encode_model(
        jnp.asarray(syms), jnp.asarray(lens), jnp.asarray(ic), params.freq_max,
        delta=DELTA,
    )
    return lo, hi, tot


def test_sharded_encode_matches_oracle(mesh):
    p = Parameters(8, 14, 16)
    n = pad_to_devices(16, mesh)
    blocks, syms, lens, ic = _prep(p, n_blocks=n)
    lo, hi, tot = _encode_model(p, syms, lens, ic)
    w = coder.max_block_words(min(257 + DELTA * K, p.freq_max), p.symbol_count, p, K)
    words, byte_lens, ovf = encode_blocks_sharded(
        lo, hi, tot, jnp.asarray(lens), p, w, mesh
    )
    assert not np.asarray(ovf).any()
    streams = words_to_streams(np.asarray(words), np.asarray(byte_lens))
    for i, d in enumerate(blocks):
        assert streams[i] == compress_block(d, p, ic.astype(np.int64), DELTA), i


def test_sharded_decode_roundtrip(mesh):
    p = Parameters(8, 14, 16)
    n = pad_to_devices(16, mesh)
    blocks, syms, lens, ic = _prep(p, n_blocks=n)
    w = coder.max_block_words(min(257 + DELTA * K, p.freq_max), p.symbol_count, p, K)
    refs = [compress_block(d, p, ic.astype(np.int64), DELTA) for d in blocks]
    wm = streams_to_words(refs, w)
    dec = np.asarray(
        decode_blocks_sharded(
            jnp.asarray(wm), jnp.asarray(lens), jnp.asarray(ic), p, K, mesh, delta=DELTA
        )
    )
    for i, d in enumerate(blocks):
        assert bytes(dec[i, : lens[i]].astype(np.uint8)) == d, i


def test_sharded_output_is_actually_sharded(mesh):
    p = Parameters(8, 14, 16)
    n = pad_to_devices(16, mesh)
    _, syms, lens, ic = _prep(p, n_blocks=n)
    lo, hi, tot = _encode_model(p, syms, lens, ic)
    w = coder.max_block_words(min(257 + DELTA * K, p.freq_max), p.symbol_count, p, K)
    words, _, _ = encode_blocks_sharded(lo, hi, tot, jnp.asarray(lens), p, w, mesh)
    # The lane axis must be partitioned across all mesh devices.
    assert len(words.sharding.device_set) == mesh.devices.size


# ---------------------------------------------------------------------------
# Production-path sharding: the Pallas kernels under the same dp mesh
# (interpret mode off-TPU — identical semantics, same shard_map wiring the
# api uses on a multi-chip slice).
# ---------------------------------------------------------------------------


def test_sharded_pallas_encode_decode_bit_exact(mesh):
    from redux_tpu.parallel.mesh import (
        decode_blocks_pallas_sharded,
        encode_blocks_pallas_m_sharded,
    )

    p = Parameters(8, 14, 16)
    blocks, syms, lens, ic = _prep(p, n_blocks=12)
    w = K // 4 + 16
    words, byte_lens, ovf = encode_blocks_pallas_m_sharded(
        jnp.asarray(syms), jnp.asarray(lens), jnp.asarray(ic), p, w, mesh,
        delta=DELTA,
    )
    assert not np.asarray(ovf).any()
    wn, bl = np.asarray(words), np.asarray(byte_lens)
    for i, d in enumerate(blocks):
        got = wn[i].astype(">u4").tobytes()[: bl[i]]
        assert got == compress_block(d, p, ic.astype(np.int64), DELTA), i
    dec = np.asarray(
        decode_blocks_pallas_sharded(
            jnp.asarray(wn), jnp.asarray(lens), jnp.asarray(ic), p, K, mesh,
            delta=DELTA,
        )
    )
    for i, d in enumerate(blocks):
        assert bytes(dec[i, : lens[i]].astype(np.uint8)) == d, i


def test_sharded_pallas_output_is_partitioned(mesh):
    from redux_tpu.parallel.mesh import _encode_pallas_sharded
    from redux_tpu.ops.pallas_decode import init_cum_column
    from redux_tpu.parallel.mesh import pallas_lane_quantum

    p = Parameters(8, 14, 16)
    _, syms, lens, ic = _prep(p, n_blocks=8)
    q = pallas_lane_quantum(mesh)
    k_pad = ((K + 1 + 31) // 32) * 32
    syms_t = jnp.pad(
        jnp.asarray(syms, jnp.int32), ((0, q - syms.shape[0]), (0, k_pad - K))
    ).T
    lens_row = jnp.pad(
        jnp.asarray(lens, jnp.int32), (0, q - lens.shape[0]), constant_values=-1
    ).reshape(1, q)
    icol = jnp.asarray(init_cum_column(np.asarray(ic), p))
    words_t, _, _ = _encode_pallas_sharded(
        syms_t, lens_row, icol, p, 256, DELTA, mesh
    )
    # The lane axis of the kernel output must span every mesh device.
    assert len(words_t.sharding.device_set) == mesh.devices.size


def test_sharded_decode_mismatched_lane_widths():
    """Regression (round-3 advisor, high): pallas_lane_quantum used only
    the ENCODE kernel's tile width, so per-device shards that were odd
    multiples of it failed the DECODE kernel's reshape whenever the two
    widths diverged (the default 512 vs 1024).  The quantum is now their
    lcm.  Subprocess: lane widths are import-time constants, and the
    conftest pins both to 128 for the rest of the suite."""
    import os
    import subprocess
    import sys

    env = {
        k: v for k, v in os.environ.items() if not k.startswith(("JAX_", "XLA_"))
    }
    env.update(
        # REPLACE PYTHONPATH: the harness site claims the TPU tunnel at
        # interpreter start; this worker must be CPU-only (test_multihost).
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        REDUX_TPU_LANES="128",
        REDUX_TPU_DLANES="256",  # decode tile wider than encode tile
        REDUX_TPU_FORCE_PALLAS="1",
    )
    script = (
        "import numpy as np\n"
        "from redux_tpu import api\n"
        "from redux_tpu.parallel.mesh import pallas_lane_quantum, data_parallel_mesh\n"
        "q = pallas_lane_quantum(data_parallel_mesh())\n"
        "assert q % (256 * 2) == 0 and q % (128 * 2) == 0, q\n"
        "data = (b'sharded quantum regression ' * 300)[:4096]\n"
        "arc = api.encode(data, block_size=256)\n"
        "assert api.decode(arc) == data\n"
        "print('OK')\n"
    )
    res = subprocess.run(
        [sys.executable, "-c", script],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )
    assert res.returncode == 0 and "OK" in res.stdout, res.stderr[-2000:]
