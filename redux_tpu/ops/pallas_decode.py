"""Pallas TPU decode kernel: the whole per-block symbol loop on-chip.

The XLA `lax.scan` decoder (:func:`redux_tpu.ops.coder.decode_blocks`)
pays a kernel launch plus an HBM round-trip of the ``(B, 258)`` model
state per symbol — the measured round-1 bottleneck (0.04 GB/s).  This
kernel keeps EVERYTHING resident in VMEM for a tile of 128 blocks and
runs all ``K`` symbol steps inside one kernel invocation:

* **Model state**: one dense cumulative row per lane, ``(264, 128)``
  int32 (258 live rows + freq_max padding).  Per symbol: one compare
  pass gives the mask ``b = cdf <= value``; ``sym = sum(b) - 1``;
  ``flo/fhi`` fall out of masked max/min over the same mask (the row is
  strictly increasing); the adaptation is ``cdf += delta * ~b`` unless
  frozen (the masked-suffix form of adaptive_linear.rs:33-39).
* **Interval math**: (8,20,22) products reach 2**42 — computed exactly
  with the dual-u32 + f32 primitives of :mod:`redux_tpu.ops.wide32`
  (no 64-bit emulation).  E1/E2/E3 renormalization is the closed-form
  clz derivation of :mod:`redux_tpu.ops.coder` (codec.rs:62-89 without
  per-bit loops).
* **Stream reads**: TPU v5e has no per-lane dynamic gather (probed:
  ``take_along_axis`` silently miscompiles in Mosaic), so per-lane
  bitstreams are consumed through a 2-slab ring: each lane owns two
  32-word slabs of its stream inside a ``(64, 128)`` VMEM ring.  Word
  pulls one-hot-select from the ring (pure compare/select/reduce).
  Every 32-step epoch — which consumes at most ``32 * code_bits`` bits
  < 32 words, so at most one slab boundary per lane — a batched refill
  loop walks only the dynamic span ``[pmin, pmax]`` of slab indices
  lanes actually need and merges each ``(32, 128)`` stream block into
  the ring for the lanes that want it (dense block reads, no gather;
  cost scales with lane divergence and is near zero for homogeneous
  data).
* **Output**: symbols staged per epoch in VMEM and stored as
  ``(32, 128)`` uint8 blocks.

Stream format: identical to the v2 block payload
(:func:`redux_tpu.ops.coder.encode_blocks_v2` /
:func:`redux_tpu.oracle.compress_block`): no EOF symbol, 2-bit
terminator, reads past the stream end return zero bits (the caller
zero-pads ``words``).

The kernel traces under ``jax.enable_x64(False)``: the package enables
x64 globally for the int64 XLA coder path, but Mosaic has no 64-bit
types; with x64 off every dtype below is explicitly 32-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import Parameters
from . import wide32

LANES = 128
EPOCH = 32  # symbols per inner loop; one slab-refill check per epoch
SLAB = 32  # words per stream slab
S_PAD = 264  # model rows incl. padding (258 live), multiple of 8

i32 = jnp.int32
u32 = jnp.uint32


def _decode_kernel(params: Parameters, k: int, delta: int, wn: int):
    """Kernel body for static (params, k, delta, words-per-lane)."""
    cb = params.code_bits
    S = params.symbol_count  # 257: row S of the cdf is the running total
    freq_max = params.freq_max
    n_slabs = wn // SLAB
    n_epochs = (k + EPOCH - 1) // EPOCH
    cmax = params.code_max
    half = params.code_half

    def kernel(init_ref, lens_ref, words_ref, out_ref,
               cdf_s, ring_s, stage_s, nl_s, wqs_s, pmin_s, pmax_s):
        cdf_s[:, :] = init_ref[:, :] + jnp.zeros((S_PAD, LANES), i32)
        lens = lens_ref[0, :][None, :]
        # Ring init: slabs 0 and 1 of every lane (uniform block copies).
        ring_s[0:SLAB, :] = words_ref[0:SLAB, :]
        ring_s[SLAB : 2 * SLAB, :] = words_ref[SLAB : 2 * SLAB, :]
        nl_s[0, :] = jnp.full((LANES,), 2, i32)  # next slab index to load

        def pull_word(wq):
            """ring[wq mod 64] per lane — one-hot select over 64 rows.

            The reduction runs on an i32 bitcast view (Mosaic has no
            unsigned reductions); exactly one row is selected, so the
            sum reproduces the bit pattern regardless of sign.
            """
            rows = jax.lax.broadcasted_iota(i32, (2 * SLAB, LANES), 0)
            m = rows == (wq & i32(2 * SLAB - 1))
            ring_i = jax.lax.bitcast_convert_type(ring_s[:, :], i32)
            picked = jnp.sum(jnp.where(m, ring_i, i32(0)), axis=0, dtype=i32)[None, :]
            return jax.lax.bitcast_convert_type(picked, u32)

        def read_bits(state, m):
            """Read m (<= 31) bits per lane, MSB-first.  One pull max."""
            cur, avail, wq = state
            take1 = jnp.minimum(m, avail)
            sh1 = (i32(32) - take1).astype(u32) & u32(31)
            v1 = jnp.where(take1 > 0, cur >> sh1, u32(0))
            cur = jnp.where(take1 > 0, cur << take1.astype(u32), cur)
            avail = avail - take1
            m2 = m - take1
            need = m2 > 0
            nxt = pull_word(wq)
            wq = wq + need.astype(i32)
            m2c = jnp.maximum(m2, 1).astype(u32)
            v2 = jnp.where(need, nxt >> (u32(32) - m2c), u32(0))
            cur = jnp.where(need, nxt << m2c, cur)
            avail = jnp.where(need, i32(32) - m2, avail)
            val = jnp.where(need, (v1 << m2c) | v2, v1)
            return val, (cur, avail, wq)

        def step(t, carry):
            low, high, z, cur, avail, wq = carry
            active = t < lens

            cdf = cdf_s[:, :]
            rngv = high - low + u32(1)
            count = cdf[S, :][None, :].astype(u32)
            # value = ((z+1)*count - 1) // rng  (codec.rs:131, z = pending-low)
            value = wide32.muldiv_sub1(z + u32(1), count, rngv)
            # min via i32 (Mosaic lacks unsigned min); both < 2**20.
            value = jnp.minimum(value.astype(i32), (count - u32(1)).astype(i32))
            b = cdf <= value
            sym = jnp.sum(b.astype(i32), axis=0, dtype=i32)[None, :] - i32(1)
            flo = jnp.max(jnp.where(b, cdf, i32(0)), axis=0)[None, :].astype(u32)
            fhi = jnp.min(jnp.where(b, i32(freq_max), cdf), axis=0)[None, :].astype(u32)
            upd = active & (cdf[S, :][None, :] < i32(freq_max))
            cdf_s[:, :] = cdf + jnp.where(b | ~upd, i32(0), i32(delta))

            # Narrow (codec.rs:58-60); z moves with low.
            dlo = wide32.muldiv(rngv, flo, count)
            dhi = wide32.muldiv(rngv, fhi, count)
            nlow = low + dlo
            nhigh = low + dhi - u32(1)
            nz = z - dlo
            low = jnp.where(active, nlow, low)
            high = jnp.where(active, nhigh, high)
            z = jnp.where(active, nz, z)

            # Closed-form renorm: n = n1 + n3 bits consumed; z <- (z<<n)|bits.
            n1 = jnp.where(active, jax.lax.clz(low ^ high).astype(i32) - i32(32 - cb), i32(0))
            n1w = n1.astype(u32)
            low1 = jnp.where(active, (low << n1w) & u32(cmax), low)
            high1 = jnp.where(
                active, ((high << n1w) | ((u32(1) << n1w) - u32(1))) & u32(cmax), high
            )
            a = jax.lax.clz(~(low1 << u32(32 - cb + 1))).astype(i32)
            bb = jax.lax.clz(high1 << u32(32 - cb + 1)).astype(i32)
            n3 = jnp.where(active, jnp.minimum(jnp.minimum(a, bb), i32(cb - 1)), i32(0))
            n3w = n3.astype(u32)
            low = jnp.where(active, (low1 << n3w) & u32(cmax >> 1), low1)
            high = jnp.where(
                active,
                (((high1 << n3w) | ((u32(1) << n3w) - u32(1))) & u32(cmax >> 1)) | u32(half),
                high1,
            )
            n = n1 + n3
            bits, (cur, avail, wq) = read_bits((cur, avail, wq), n)
            z = jnp.where(active, ((z << n.astype(u32)) | bits) & u32(cmax), z)

            stage_s[pl.ds(t % EPOCH, 1), :] = jnp.where(active, sym, i32(0))
            return low, high, z, cur, avail, wq

        def refill(p, _):
            blk = words_ref[pl.ds(p * SLAB, SLAB), :]
            nl = nl_s[0, :][None, :]
            m = (nl == p) & (wqs_s[0, :][None, :] + i32(1) >= nl)
            slot = (p % 2) * SLAB
            old = ring_s[pl.ds(slot, SLAB), :]
            ring_s[pl.ds(slot, SLAB), :] = jnp.where(m, blk, old)
            nl_s[0, :] = jnp.where(m[0, :], p + i32(1), nl_s[0, :])
            return 0

        def epoch(e, carry):
            carry = jax.lax.fori_loop(
                e * EPOCH, jnp.minimum((e + 1) * EPOCH, k), step, carry
            )
            # Store this epoch's symbols (one 32-row uint8 block).
            out_ref[pl.ds(e * EPOCH, EPOCH), :] = stage_s[:, :].astype(jnp.uint8)

            # Batched slab refill: a lane needs its next slab when its
            # read cursor's slab + 1 reaches the next-to-load index.
            wq = carry[5]
            wqs_s[0, :] = wq[0, :] >> i32(5)
            nl = nl_s[0, :][None, :]
            need = (wq >> i32(5)) + i32(1) >= nl
            pmin_s[0, 0] = jnp.min(jnp.where(need, nl, i32(0x7FFFFFF)))
            pmax_s[0, 0] = jnp.max(jnp.where(need, nl, i32(-1)))
            jax.lax.fori_loop(
                pmin_s[0, 0], jnp.minimum(pmax_s[0, 0] + 1, n_slabs), refill, 0
            )
            return carry

        # Prime: z = first code_bits bits (codec.rs:124-127).
        cur0 = jnp.zeros((1, LANES), u32)
        avail0 = jnp.zeros((1, LANES), i32)
        wq0 = jnp.zeros((1, LANES), i32)
        z0, (cur0, avail0, wq0) = read_bits(
            (cur0, avail0, wq0), jnp.full((1, LANES), cb, i32)
        )
        carry = (
            jnp.zeros((1, LANES), u32),  # low  (codec.rs:30)
            jnp.full((1, LANES), cmax, u32),  # high (codec.rs:31)
            z0,
            cur0,
            avail0,
            wq0,
        )
        jax.lax.fori_loop(0, n_epochs, epoch, carry)

    return kernel


@functools.partial(jax.jit, static_argnames=("params", "k", "delta"))
def _decode_pallas_jit(words_t, lens, init_col, params: Parameters, k: int, delta: int):
    wn, b = words_t.shape
    n_tiles = b // LANES
    k_pad = ((k + EPOCH - 1) // EPOCH) * EPOCH
    kernel = _decode_kernel(params, k, delta, wn)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((S_PAD, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((wn, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_pad, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        # Mosaic compiles on TPU; everywhere else (CPU tests, the 8-device
        # virtual mesh) the interpreter executes the identical semantics.
        interpret=jax.default_backend() == "cpu",
        # words tile + its prefetch double-buffer + the (K,128) u8 output
        # exceed the compiler's default 16 MiB scoped-vmem cap by a hair;
        # v5e has headroom above it.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=jax.ShapeDtypeStruct((k_pad, b), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((S_PAD, LANES), i32),  # cdf
            pltpu.VMEM((2 * SLAB, LANES), u32),  # stream ring
            pltpu.VMEM((EPOCH, LANES), i32),  # symbol stage
            pltpu.VMEM((1, LANES), i32),  # next-load slab index
            pltpu.VMEM((1, LANES), i32),  # read-cursor slab snapshot
            pltpu.SMEM((1, 1), i32),  # refill span lo
            pltpu.SMEM((1, 1), i32),  # refill span hi
        ],
    )(init_col, lens, words_t)


def decode_blocks_pallas(words, lens, init_cum, params: Parameters, k: int, delta: int = 1):
    """Drop-in for :func:`redux_tpu.ops.coder.decode_blocks` (v2 payloads).

    Args:
      words: ``(B, W)`` uint32 big-endian per-block streams, zero-padded
        past each stream's end (the v2 termination contract).
      lens: ``(B,)`` int32 symbol counts.
      init_cum: ``(symbol_count + 1,)`` initial cumulative row.
      params: must satisfy ``fits_u32`` or ``fits_wide32`` (both
        production TPU configs do).
      k: max symbols per block (static).

    Returns ``(B, k)`` uint8 decoded symbols.
    """
    if not (params.fits_u32 or params.fits_wide32):
        raise ValueError("pallas decoder requires fits_u32 or fits_wide32 params")
    b, wn = words.shape
    b_pad = ((b + LANES - 1) // LANES) * LANES
    # >= 3 zero words past any stream (the decoder legitimately reads up
    # to code_bits + pending_bound bits past the terminator), >= 2 slabs
    # for the ring init, slab-aligned for the block refills.
    wn_pad = ((max(wn + 3, 2 * SLAB) + SLAB - 1) // SLAB) * SLAB
    with jax.enable_x64(False):
        words = jnp.pad(words.astype(jnp.uint32), ((0, b_pad - b), (0, wn_pad - wn)))
        words_t = words.T  # (Wn, B): lanes on the 128-wide axis
        lens_p = jnp.pad(lens.astype(jnp.int32), (0, b_pad - b)).reshape(1, b_pad)
        init_col = jnp.pad(
            init_cum.astype(jnp.int32),
            (0, S_PAD - int(init_cum.shape[0])),
            constant_values=np.int32(params.freq_max),
        ).reshape(S_PAD, 1)
        out = _decode_pallas_jit(words_t, lens_p, init_col, params, k, int(delta))
        return out[:k, :b].T  # (B, k) uint8
