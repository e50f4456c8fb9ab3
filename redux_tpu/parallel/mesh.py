"""Device-mesh sharding of the block codec.

Blocks are independent streams, so the codec shards embarrassingly along
the block (lane) axis: a 1-D ``Mesh`` named ``"dp"``, every array
partitioned on its leading dimension, and ``jax.shard_map`` so each
device runs its own scan — including its own loop conditions — with
**zero collectives in the hot path**.  (Partitioning the jitted function
instead would turn every ``jnp.any`` in the renorm/run loops into a
cross-device all-reduce per iteration.)

Outputs (words, byte lengths / symbols) come back sharded on the same axis
and are gathered in original block order by the host splice — the
"ordered all-gather" of the BASELINE plan happens implicitly through the
output sharding.

Multi-host: initialize ``jax.distributed`` (see
:func:`initialize_multihost`), build the mesh over all global devices, and
feed each process its local shard of blocks; everything else is identical.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..params import Parameters
from ..ops import coder


def data_parallel_mesh(devices: Optional[Sequence] = None, n: Optional[int] = None) -> Mesh:
    """A 1-D mesh over ``devices`` (default: all) with axis name ``dp``."""
    devs = list(devices) if devices is not None else list(jax.devices())
    if n is not None:
        devs = devs[:n]
    return Mesh(np.array(devs), ("dp",))


def pad_to_devices(b: int, mesh: Mesh) -> int:
    """Round a lane count up to a multiple of the mesh size."""
    n = mesh.devices.size
    return ((max(b, 1) + n - 1) // n) * n


# check_vma=False throughout: the init_cum operand is replicated (P())
# and consumed read-only inside every shard; the varying-manual-axes
# checker cannot prove that for the scan-heavy bodies, but replication
# is guaranteed by construction (the caller passes one host array).


@functools.partial(
    jax.jit, static_argnames=("params", "n_words", "mesh"), donate_argnums=()
)
def _encode_sharded(lo, hi, tot, lens, params: Parameters, n_words: int, mesh: Mesh):
    fn = functools.partial(coder.encode_blocks_v2.__wrapped__, params=params, n_words=n_words)
    spec = P("dp")
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(spec, spec, spec),
        check_vma=False,
    )(lo, hi, tot, lens)


def encode_blocks_sharded(lo, hi, tot, lens, params: Parameters, n_words: int, mesh: Mesh):
    """Sharded :func:`redux_tpu.ops.coder.encode_blocks_v2` (lanes over ``dp``).

    The lane count must be a multiple of the mesh size
    (use :func:`pad_to_devices`).  Returns ``(words, byte_lens, ovf)``.
    """
    return _encode_sharded(lo, hi, tot, lens, params, n_words, mesh)


@functools.partial(jax.jit, static_argnames=("params", "k", "delta", "mesh"))
def _decode_sharded(words, lens, init_cum, params: Parameters, k: int, delta: int, mesh: Mesh):
    fn = functools.partial(coder.decode_blocks.__wrapped__, params=params, k=k, delta=delta)
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P()),
        out_specs=P("dp"),
        check_vma=False,
    )(words, lens, init_cum)


def decode_blocks_sharded(words, lens, init_cum, params: Parameters, k: int, mesh: Mesh, delta: int = 1):
    """Sharded :func:`redux_tpu.ops.coder.decode_blocks`."""
    return _decode_sharded(words, lens, init_cum, params, k, delta, mesh)


def initialize_multihost(**kwargs) -> None:
    """Initialize ``jax.distributed`` for multi-host pods (DCN).

    Thin wrapper so applications embed the codec in a pod-slice job:
    call once per process before building the mesh; then
    ``data_parallel_mesh()`` spans all global devices and each process
    supplies its local block shard.  No-op if already initialized.
    """
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized
