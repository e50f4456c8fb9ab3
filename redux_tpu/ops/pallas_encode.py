"""Pallas TPU encode kernels: the v2 symbol loop + bit packing on-chip.

Encoders in this file; all produce bit-identical streams:

* :func:`encode_blocks_ranked` — the PRODUCTION path: per-position model
  values from the model-values kernel (:mod:`redux_tpu.ops.pallas_model`
  on TPU; the closed-form rank precompute :mod:`redux_tpu.ops.ranks` on
  CPU) feed the streaming coder kernel below, which codes them with no
  model state in its loop.
* :func:`encode_blocks_pallas_m` — the fully-fused model-in-kernel
  variant (dense cdf rows + coder + emission in ONE kernel).  Kept as an
  independent implementation for differential cross-checks; its fused
  emission makes it far slower than the split pipeline.

The XLA planned encoder (:func:`redux_tpu.ops.coder.encode_blocks_v2`)
runs one `lax.scan` step per symbol (kernel-launch overhead ×K) and a
17-pass HBM compaction of the sparse flushed words — together the
round-1 encode bottleneck (0.015 GB/s).  The streaming kernel runs
everything inside one launch per lane-tile with all state in VMEM:

* **Inputs**: per-position ``lo/hi`` model values (model-values kernel /
  rank precompute), streamed through the grid in 32-step epoch blocks
  (auto double-buffered HBM→VMEM); the running totals are a closed form
  of ``t`` computed in-kernel from two SMEM scalars.
* **Interval math**: dual-u32 + f32 exact arithmetic
  (:mod:`redux_tpu.ops.wide32`) — handles the (8,20,22) production
  config without 64-bit emulation.  Closed-form E1/E2/E3 renorm and the
  ≤64-bit per-step emission piece are shared with the XLA encoder
  (:func:`redux_tpu.ops.coder._piece64` et al.).
* **Bit packing** (the part XLA could not do without HBM round-trips):
  each step stages its ≤2 flushed words densely (fixed rows — no
  scatter).  Once per 32-step epoch the stage is compacted in VMEM by
  the monotone-shift passes (log2(64) = 6 phases), rotated to the
  per-lane write offset by a 7-phase conditional roll (TPU v5e has no
  per-lane scatter/gather — probed), merged into a 128-row ring, and
  the ring's completed 32-word slabs are dumped to the output block by
  a batched loop over the dynamic span of per-lane slab indices.

Output streams are bit-identical to ``encode_blocks_v2`` / the
sequential oracle (differential tests: tests/test_pallas_encode.py).

Traced under ``jax.enable_x64(False)`` (Mosaic has no 64-bit types).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import Parameters
from . import wide32
from .coder import _append96, _leftalign64, _piece64

import os as _os
LANES = int(_os.environ.get("REDUX_TPU_LANES", "1024"))  # lanes per kernel program
# (EG = LANES/128 = 8 sublane groups: full (8, 128) vregs for the coder's
# per-lane math.  The round-3 default of 512 half-filled every vreg and
# cost ~2 ms on the bench corpus — found once slope timing was trusted.)
if LANES <= 0 or LANES % 128:
    raise ValueError(
        f"REDUX_TPU_LANES must be a positive multiple of 128 (got {LANES}); "
        f"set before first import — later changes have no effect"
    )
EPOCH = 32  # symbols per grid step
RING = 256  # ring rows (2 output slabs + epoch slack); epoch flushes < 96 words
SLAB = 128  # words per dump slab: large slabs keep the statically-unrolled
# dump sweep short — Mosaic compile time grows superlinearly with the
# number of pl.when regions (measured: 32-word slabs = 257 regions at
# 32 KiB blocks took ~13 min to compile; 128-word slabs compile fast)
SLAB_SH = 7  # log2(SLAB)
RING_PH = 8  # log2(RING) conditional roll phases
LN = 128  # hardware lane width (minor dim)
EG = max(1, LANES // LN)  # sublane-packed lane groups (streaming kernel);
# the per-lane coder/emission math runs on full (EG, 128) vregs instead of
# 1/8-occupied (1, LANES) rows — same layout win as the decode kernel.
from .pallas_decode import S_EXT, S_PAD  # shared model-row geometry

i32 = jnp.int32
u32 = jnp.uint32


def _encode_kernel(params: Parameters, k: int, n_words: int, n_epochs: int,
                   adapt_delta: int = 1, unroll: bool = True,
                   model_inline: bool = False):
    """Streaming coder kernel; ``model_inline`` fuses the two-level
    model-values sweep (ops/pallas_model.py semantics) into the same
    program: per position the bucket window select yields (flo, fhi)
    directly in registers — no (k_pad, b) lo/hi HBM planes at all — and
    the model sweep of one position overlaps the coder's serial
    interval/emission chain of its neighbors in the unrolled schedule."""
    cb = params.code_bits
    cmax = params.code_max
    half = params.code_half
    quarter = params.code_one_fourth

    from .pallas_decode import BS, C_PAD, NB, S_EXT  # model geometry

    def kernel(*refs):
        if model_inline:
            (lens_ref, syms_ref, init_ref, consts_ref, out_ref, blen_ref,
             ovf_ref, st_s, ring_s, nw_s, nd_s, acc_s, iv_s, cdf_s,
             coarse_s) = refs
        else:
            (lens_ref, lo_ref, hi_ref, consts_ref, out_ref, blen_ref,
             ovf_ref, st_s, ring_s, nw_s, nd_s, acc_s, iv_s) = refs
        e = pl.program_id(1)
        lens = lens_ref[:, :]  # (EG, LN)
        init_total = consts_ref[0, 0]  # SMEM scalars: model totals are a
        tfreeze = consts_ref[0, 1]  # closed form of t (ranks.py), computed
        # in-kernel instead of streaming a third (B, K) plane from HBM
        if model_inline:
            rows_c = jax.lax.broadcasted_iota(i32, (C_PAD, EG, LN), 0)
            rows_b = jax.lax.broadcasted_iota(i32, (BS, EG, LN), 0)

        def model_lohi(ii, t, active):
            """One two-level model step (pallas_model.step_bucket
            semantics): extract pre-update (flo, fhi) for position ii's
            symbol, then land its +delta suffix update on the fine and
            coarse rows.  The freeze gate and pad lanes (lens = -1) fall
            out of the same (t < lens) & (t < tfreeze) test."""
            v = syms_ref[pl.ds(ii, 1), :, :][0]
            dv = jnp.where(active & (t < tfreeze), i32(adapt_delta), i32(0))
            jb = v >> i32(3)
            vl = v & i32(BS - 1)
            C = coarse_s[:, :, :]
            cnext = jnp.sum(
                jnp.where(rows_c == (jb + i32(1))[None], C, i32(0)),
                axis=0, dtype=i32,
            )
            coarse_s[:, :, :] = C + jnp.where(
                rows_c > jb[None], dv[None], i32(0)
            )
            # Round-robin select chains + min-merge (see pallas_decode).
            WSEL = int(_os.environ.get("REDUX_TPU_WSEL", "1"))
            if WSEL < 1:
                raise ValueError(f"REDUX_TPU_WSEL must be >= 1 (got {WSEL})")
            wacc = [jnp.full((BS, EG, LN), 0x7FFFFFFF, i32)
                    for _ in range(WSEL)]
            for c in range(NB):
                ch = cdf_s[c * BS : (c + 1) * BS, :, :]
                wacc[c % WSEL] = jnp.where((jb == c)[None], ch, wacc[c % WSEL])
                m = rows_b > (v - i32(c * BS))[None]
                cdf_s[c * BS : (c + 1) * BS, :, :] = ch + jnp.where(
                    m, dv[None], i32(0)
                )
            w = wacc[0]
            for s in range(1, WSEL):
                w = jnp.minimum(w, wacc[s])
            flo = jnp.sum(
                jnp.where(rows_b == vl[None], w, i32(0)), axis=0, dtype=i32
            )
            fhi_in = jnp.sum(
                jnp.where(rows_b == (vl + i32(1))[None], w, i32(0)),
                axis=0, dtype=i32,
            )
            fhi = jnp.where(vl == i32(BS - 1), cnext, fhi_in)
            return flo.astype(u32), fhi.astype(u32)

        @pl.when(e == 0)
        def _init():
            if model_inline:
                cdf_s[:, :, :] = init_ref[0:S_PAD, :, :] + jnp.zeros(
                    (S_PAD, EG, LN), i32
                )
                coarse_s[:, :, :] = init_ref[S_PAD:S_EXT, :, :] + jnp.zeros(
                    (C_PAD, EG, LN), i32
                )
            # iv rows: 0 low, 1 high, 2 pending, 3 ovf flag.
            iv_s[0, :, :] = jnp.zeros((EG, LN), u32) + u32(params.code_min)
            iv_s[1, :, :] = jnp.zeros((EG, LN), u32) + u32(cmax)
            iv_s[2, :, :] = jnp.zeros((EG, LN), u32)
            iv_s[3, :, :] = jnp.zeros((EG, LN), u32)
            acc_s[0, :, :] = jnp.zeros((EG, LN), u32)  # a0 (96-bit left-aligned)
            acc_s[1, :, :] = jnp.zeros((EG, LN), u32)  # a1
            acc_s[2, :, :] = jnp.zeros((EG, LN), u32)  # a2
            acc_s[3, :, :] = jnp.zeros((EG, LN), u32)  # accbits
            nw_s[:, :] = jnp.zeros((EG, LN), i32)  # words flushed (ring)
            nd_s[:, :] = jnp.zeros((EG, LN), i32)  # slabs dumped
            ring_s[:, :, :] = jnp.zeros((RING, EG, LN), u32)

        def step(ii, carry):
            low, high, pending, a0, a1, a2, accbits, ovf, cnt = carry
            t = e * EPOCH + ii
            active = t < lens
            is_term = t == lens

            if model_inline:
                flo, fhi = model_lohi(ii, t, active)
            else:
                flo = lo_ref[pl.ds(ii, 1), :, :][0].astype(u32)
                fhi = hi_ref[pl.ds(ii, 1), :, :][0].astype(u32)
            # tot_t = init_total + delta * min(t, lens, t_freeze)
            # (ranks.precompute_encode_model's closed form; pad lanes have
            # lens = -1, giving init_total - delta >= 2 — no div-by-zero).
            n_upd = jnp.minimum(jnp.minimum(t + jnp.zeros((EG, LN), i32), lens), tfreeze)
            count = jnp.maximum(init_total + i32(adapt_delta) * n_upd, i32(1)).astype(u32)

            # Interval narrowing (codec.rs:58-60) — exact wide arithmetic;
            # one shared reciprocal replaces both bounds' divides (wide32).
            rngv = high - low + u32(1)
            cnt_r = wide32.rcp_f32(count)
            nlow = low + wide32.muldiv_rcp(rngv, flo, count, cnt_r)
            nhigh = low + wide32.muldiv_rcp(rngv, fhi, count, cnt_r) - u32(1)
            low = jnp.where(active, nlow, low)
            high = jnp.where(active, nhigh, high)

            # Closed-form renorm counts.
            n1 = jnp.where(active, jax.lax.clz(low ^ high).astype(i32) - i32(32 - cb), i32(0))
            n1w = n1.astype(u32)
            low1 = jnp.where(active, (low << n1w) & u32(cmax), low)
            high1 = jnp.where(
                active, ((high << n1w) | ((u32(1) << n1w) - u32(1))) & u32(cmax), high
            )
            aa = jax.lax.clz(~(low1 << u32(32 - cb + 1))).astype(i32)
            bbq = jax.lax.clz(high1 << u32(32 - cb + 1)).astype(i32)
            n3 = jnp.where(active, jnp.minimum(jnp.minimum(aa, bbq), i32(cb - 1)), i32(0))
            n3w = n3.astype(u32)
            low2 = jnp.where(active, (low1 << n3w) & u32(cmax >> 1), low1)
            high2 = jnp.where(
                active,
                (((high1 << n3w) | ((u32(1) << n3w) - u32(1))) & u32(cmax >> 1)) | u32(half),
                high1,
            )

            # Emission piece: [b1][pending opposite][rest] (codec.rs:39-46),
            # or the 2-bit v2 terminator at t == lens.
            emit = active & (n1 > 0)
            prefix = jnp.where(emit, low >> (u32(cb) - n1w), u32(0))
            b1 = prefix >> jnp.maximum(n1 - 1, 0).astype(u32)
            rest = prefix & ((u32(1) << jnp.maximum(n1 - 1, 0).astype(u32)) - u32(1))
            rest_len = jnp.maximum(n1 - 1, 0)
            tq = (low + u32(quarter) - u32(1)) >> u32(cb - 2)
            b1 = jnp.where(is_term, tq >> u32(1), b1)
            rest = jnp.where(is_term, tq & u32(1), rest)
            rest_len = jnp.where(is_term, i32(1), rest_len)
            emit = emit | is_term

            pend_i = pending.astype(i32)
            m1 = jnp.where(emit, rest_len + 1 + pend_i, 0)
            ovf = ovf | (m1 > 64).astype(u32)
            m1 = jnp.minimum(m1, 64)
            phi, plo = _piece64(b1, pend_i, rest, rest_len)
            lhi, llo = _leftalign64(phi, plo, m1)
            a0n, a1n, a2n = _append96(a0, a1, a2, accbits.astype(i32), lhi, llo)
            a0 = jnp.where(emit, a0n, a0)
            a1 = jnp.where(emit, a1n, a1)
            a2 = jnp.where(emit, a2n, a2)
            accbits = accbits + m1.astype(u32)
            pending = (jnp.where(emit, 0, pend_i) + n3).astype(u32)

            # Flush up to two completed words into the dense stage.
            f1 = accbits >= u32(32)
            w0 = jnp.where(f1, a0, u32(0))
            a0 = jnp.where(f1, a1, a0)
            a1 = jnp.where(f1, a2, a1)
            a2 = jnp.where(f1, u32(0), a2)
            accbits = jnp.where(f1, accbits - u32(32), accbits)
            f2 = accbits >= u32(32)
            w1 = jnp.where(f2, a0, u32(0))
            a0 = jnp.where(f2, a1, a0)
            a1 = jnp.where(f2, a2, a1)
            a2 = jnp.where(f2, u32(0), a2)
            accbits = jnp.where(f2, accbits - u32(32), accbits)
            # Stage this step's flushed words densely at fixed rows, with
            # their compaction displacement and validity alongside (the
            # step knows its in-epoch word count `cnt`, so no cross-step
            # prefix sums or row upsampling are needed in the epilogue).
            # Both rows share one displacement: (2*ii) - cnt == (2*ii+1)
            # - (cnt+1), non-negative and non-decreasing over rows.
            disp = (i32(2) * ii - cnt).astype(u32)
            st_s[pl.ds(2 * ii, 1), :, :] = w0[None]
            st_s[pl.ds(2 * ii + 1, 1), :, :] = w1[None]
            st_s[pl.ds(64 + 2 * ii, 1), :, :] = jnp.where(f1, disp, u32(0))[None]
            st_s[pl.ds(64 + 2 * ii + 1, 1), :, :] = jnp.where(f2, disp, u32(0))[None]
            st_s[pl.ds(128 + 2 * ii, 1), :, :] = f1.astype(u32)[None]
            st_s[pl.ds(128 + 2 * ii + 1, 1), :, :] = f2.astype(u32)[None]
            cnt = cnt + f1.astype(i32) + f2.astype(i32)

            return low2, high2, pending, a0, a1, a2, accbits, ovf, cnt

        carry = (
            iv_s[0, :, :], iv_s[1, :, :], iv_s[2, :, :],
            acc_s[0, :, :], acc_s[1, :, :], acc_s[2, :, :],
            acc_s[3, :, :], iv_s[3, :, :],
            jnp.zeros((EG, LN), i32),  # cnt: words staged this epoch
        )
        # Statically unrolled on TPU (static stage addressing); rolled
        # fori_loop in interpret mode (XLA CPU compile-time blowup).
        if unroll:
            for ii in range(EPOCH):
                carry = step(ii, carry)
        else:
            carry = jax.lax.fori_loop(0, EPOCH, step, carry)
        low, high, pending, a0, a1, a2, accbits, ovf, cnt = carry
        iv_s[0, :, :] = low
        iv_s[1, :, :] = high
        iv_s[2, :, :] = pending
        iv_s[3, :, :] = ovf
        acc_s[0, :, :] = a0
        acc_s[1, :, :] = a1
        acc_s[2, :, :] = a2
        acc_s[3, :, :] = accbits

        # ---- epoch epilogue: compact → rotate → merge → dump ------------
        rows64 = jax.lax.broadcasted_iota(i32, (2 * EPOCH, EG, LN), 0)
        c_tot = cnt
        val = st_s[0 : 2 * EPOCH, :, :]
        delta = st_s[64 : 64 + 2 * EPOCH, :, :].astype(i32)
        valid = st_s[128 : 128 + 2 * EPOCH, :, :] != u32(0)

        def shift_up(a, n, fill):
            rolled = pltpu.roll(a, 2 * EPOCH - n, axis=0)
            keep = rows64 < i32(2 * EPOCH - n)
            return jnp.where(keep, rolled, fill)

        for jph in range(6):  # log2(64) monotone-shift compaction phases
            sh = 1 << jph
            move = valid & (((delta >> jph) & 1) == 1)
            # Mosaic cannot rotate i1 vectors — roll the mask as i32.
            m_in = shift_up(move.astype(i32), sh, i32(0)) != 0
            val = jnp.where(m_in, shift_up(val, sh, u32(0)), val)
            delta = jnp.where(m_in, shift_up(delta, sh, i32(0)), delta)
            valid = m_in | (valid & ~move)

        # Rotate compacted words to ring offset nw (mod RING) per lane.
        rot = jnp.concatenate(
            [val, jnp.zeros((RING - 2 * EPOCH, EG, LN), u32)], axis=0
        )
        nw0 = nw_s[:, :]
        for kph in range(RING_PH):  # log2(RING) conditional roll phases
            sh = 1 << kph
            cond = (((nw0 >> kph) & 1) == 1)[None]
            rot = jnp.where(cond, pltpu.roll(rot, sh, axis=0), rot)
        ringrows = jax.lax.broadcasted_iota(i32, (RING, EG, LN), 0)
        tgt = (ringrows - nw0[None]) & i32(RING - 1)
        write = tgt < c_tot[None]
        ring_s[:, :, :] = jnp.where(write, rot, ring_s[:, :, :])
        nw_s[:, :] = nw0 + c_tot

        def run_dumps(full_tail):
            # Statically-unrolled slab sweep (dynamically-addressed VMEM
            # block accesses stall ~1.4 us each on v5e; static slices
            # predicated by pl.when(any lane dumps this slab) cost two
            # vector ops when skipped).
            limit = (
                nw_s[:, :] + (i32(SLAB - 1) if full_tail else i32(0))
            ) >> i32(SLAB_SH)
            for p in range(n_words // SLAB):
                m = (nd_s[:, :] == p) & (p < limit)

                @pl.when(jnp.any(m))
                def _(p=p, m=m):
                    slot = (p % (RING // SLAB)) * SLAB
                    blk = ring_s[slot : slot + SLAB, :, :]
                    out_ref[p * SLAB : (p + 1) * SLAB, :, :] = jnp.where(
                        m[None], blk, out_ref[p * SLAB : (p + 1) * SLAB, :, :]
                    )
                    nd_s[:, :] = jnp.where(m, p + i32(1), nd_s[:, :])

        run_dumps(False)

        @pl.when(e == n_epochs - 1)
        def _finish():
            # Tail: remaining accbits (< 32) left-aligned in a0 — one word.
            accb = acc_s[3, :, :]
            a0v = acc_s[0, :, :]
            nw0f = nw_s[:, :]
            has_tail = accb > u32(0)
            # merge the single tail word at ring row nw mod RING
            tgtrow = nw0f & i32(RING - 1)
            m = (ringrows == tgtrow[None]) & has_tail[None]
            ring_s[:, :, :] = jnp.where(m, a0v[None], ring_s[:, :, :])
            nw_s[:, :] = nw0f + has_tail.astype(i32)
            # byte length BEFORE tail-word padding (v2: bits -> bytes)
            bits = nw0f.astype(i32) * i32(32) + accb.astype(i32)
            blen_ref[:, :] = (bits + i32(7)) >> i32(3)
            ovf_ref[:, :] = iv_s[3, :, :].astype(i32)
            run_dumps(True)

    return kernel


@functools.partial(jax.jit, static_argnames=("params", "n_words", "delta"))
def _encode_pallas_jit(lo_t, hi_t, consts, lens, params: Parameters, n_words: int,
                       delta: int = 1):
    k_pad, b = lo_t.shape
    n_tiles = b // LANES
    n_epochs = k_pad // EPOCH
    k = k_pad  # steps cover t in [0, k_pad); callers pad past lens
    nw_pad = ((n_words + SLAB - 1) // SLAB) * SLAB
    interp = jax.default_backend() == "cpu"
    kernel = _encode_kernel(params, k, nw_pad, n_epochs, adapt_delta=delta,
                            unroll=not interp)

    # Sublane-packed relayout: lane ell -> (tile, g, l) with
    # ell = tile*EG*LN + g*LN + l (one device copy each way).
    def to3(x):
        return (
            x.reshape(k_pad, n_tiles, EG, LN)
            .transpose(0, 2, 1, 3)
            .reshape(k_pad, EG, n_tiles * LN)
        )

    l3 = lens.reshape(n_tiles, EG, LN).transpose(1, 0, 2).reshape(EG, n_tiles * LN)
    out, blen, ovf = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_epochs),
        interpret=interp,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((EG, LN), lambda i, e: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((EPOCH, EG, LN), lambda i, e: (e, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((EPOCH, EG, LN), lambda i, e: (e, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i, e: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((nw_pad, EG, LN), lambda i, e: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((EG, LN), lambda i, e: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((EG, LN), lambda i, e: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nw_pad, EG, b // EG), jnp.uint32),
            jax.ShapeDtypeStruct((EG, b // EG), jnp.int32),
            jax.ShapeDtypeStruct((EG, b // EG), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((192, EG, LN), u32),  # stage: 64 words + 64 disp + 64 valid
            pltpu.VMEM((RING, EG, LN), u32),  # ring
            pltpu.VMEM((EG, LN), i32),  # nw
            pltpu.VMEM((EG, LN), i32),  # nd
            pltpu.VMEM((4, EG, LN), u32),  # acc a0..a2 + accbits
            pltpu.VMEM((4, EG, LN), u32),  # low, high, pending, ovf
        ],
    )(l3, to3(lo_t), to3(hi_t), consts)
    # Back to the caller's 2-D lane order.
    words = (
        out.reshape(nw_pad, EG, n_tiles, LN).transpose(0, 2, 1, 3).reshape(nw_pad, b)
    )
    blen2 = blen.reshape(EG, n_tiles, LN).transpose(1, 0, 2).reshape(1, b)
    ovf2 = ovf.reshape(EG, n_tiles, LN).transpose(1, 0, 2).reshape(1, b)
    return words, blen2, ovf2


@functools.partial(
    jax.jit, static_argnames=("params", "n_words", "delta", "variant")
)
def _encode_fused_model_jit(syms_t, lens, init_col, consts, params: Parameters,
                            n_words: int, delta: int = 1, variant: str = ""):
    """ONE kernel for the whole encode: model sweep + streaming coder.

    Same contract as :func:`_encode_pallas_jit` but taking the (k_pad, b)
    SYMBOL plane instead of precomputed lo/hi planes — the two-level
    model sweep runs inline (``_encode_kernel(model_inline=True)``), so
    the ~8 B/B lo/hi HBM planes never exist and the model sweep of one
    position overlaps the coder chain of its neighbors.
    """
    k_pad, b = syms_t.shape
    n_tiles = b // LANES
    n_epochs = k_pad // EPOCH
    nw_pad = ((n_words + SLAB - 1) // SLAB) * SLAB
    interp = jax.default_backend() == "cpu"
    kernel = _encode_kernel(params, k_pad, nw_pad, n_epochs, adapt_delta=delta,
                            unroll=not interp, model_inline=True)

    def to3(x):
        return (
            x.reshape(k_pad, n_tiles, EG, LN)
            .transpose(0, 2, 1, 3)
            .reshape(k_pad, EG, n_tiles * LN)
        )

    l3 = lens.reshape(n_tiles, EG, LN).transpose(1, 0, 2).reshape(EG, n_tiles * LN)
    i3 = init_col.reshape(S_EXT, 1, 1)
    out, blen, ovf = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_epochs),
        interpret=interp,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((EG, LN), lambda i, e: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((EPOCH, EG, LN), lambda i, e: (e, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_EXT, 1, 1), lambda i, e: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i, e: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((nw_pad, EG, LN), lambda i, e: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EG, LN), lambda i, e: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((EG, LN), lambda i, e: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nw_pad, EG, b // EG), jnp.uint32),
            jax.ShapeDtypeStruct((EG, b // EG), jnp.int32),
            jax.ShapeDtypeStruct((EG, b // EG), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((192, EG, LN), u32),  # stage
            pltpu.VMEM((RING, EG, LN), u32),  # ring
            pltpu.VMEM((EG, LN), i32),  # nw
            pltpu.VMEM((EG, LN), i32),  # nd
            pltpu.VMEM((4, EG, LN), u32),  # acc
            pltpu.VMEM((4, EG, LN), u32),  # low, high, pending, ovf
            pltpu.VMEM((S_PAD, EG, LN), i32),  # model cdf rows
            pltpu.VMEM(((S_EXT - S_PAD), EG, LN), i32),  # coarse bucket row
        ],
    )(l3, to3(syms_t), i3, consts)
    words = (
        out.reshape(nw_pad, EG, n_tiles, LN).transpose(0, 2, 1, 3).reshape(nw_pad, b)
    )
    blen2 = blen.reshape(EG, n_tiles, LN).transpose(1, 0, 2).reshape(1, b)
    ovf2 = ovf.reshape(EG, n_tiles, LN).transpose(1, 0, 2).reshape(1, b)
    return words, blen2, ovf2


def encode_blocks_pallas(lo, hi, lens, init_total, params: Parameters,
                         n_words: int, delta: int = 1):
    """Drop-in for :func:`redux_tpu.ops.coder.encode_blocks_v2`.

    Args: ``(B, K)`` int32 lo/hi model values (rank precompute), ``(B,)``
    lens, and the scalar initial model total (``init_cum[-1]``) — the
    per-position totals are a closed form of ``t`` and are computed
    inside the kernel instead of streaming a third (B, K) plane from HBM
    (one third of the kernel's input bandwidth).  Returns
    ``(words (B, n_words) u32, byte_lens (B,), ovf (B,))`` with streams
    bit-identical to the XLA encoder.
    """
    if not (params.fits_u32 or params.fits_wide32):
        raise ValueError("pallas encoder requires fits_u32 or fits_wide32 params")
    b, k = lo.shape
    b_pad = ((b + LANES - 1) // LANES) * LANES
    # Steps must reach t == lens == k for full blocks (the terminator).
    k_pad = ((k + 1 + EPOCH - 1) // EPOCH) * EPOCH
    with jax.enable_x64(False):
        def prep(x, fill):
            x = jnp.pad(x.astype(jnp.int32), ((0, b_pad - b), (0, k_pad - k)),
                        constant_values=fill)
            return x.T  # (K_pad, B)

        lo_t = prep(lo, 0)
        hi_t = prep(hi, 0)
        it0 = jnp.asarray(init_total, jnp.int32).reshape(())
        # Updates stop once the running total reaches freq_max
        # (adaptive_linear.rs:34; identical formula in ranks.py).
        tfreeze = jnp.maximum(
            (jnp.int32(params.freq_max) - it0 + (delta - 1)) // jnp.int32(delta),
            0,
        )
        consts = jnp.stack([it0, tfreeze]).reshape(1, 2)
        lens_p = jnp.pad(lens.astype(jnp.int32), (0, b_pad - b),
                         constant_values=-1).reshape(1, b_pad)
        nw_pad = ((n_words + SLAB - 1) // SLAB) * SLAB
        words_t, blen, ovf = _encode_pallas_jit(
            lo_t, hi_t, consts, lens_p, params, nw_pad, int(delta)
        )
        return words_t.T[:b, :n_words], blen[0, :b], ovf[0, :b].astype(bool)


def _encode_kernel_m(params: Parameters, n_words: int, n_epochs: int, delta: int,
                     unroll: bool = True):
    """Model-in-kernel variant: the dense cumulative row lives in VMEM.

    Replaces the rank-precompute inputs (lo/hi/tot streamed from HBM —
    measured 1.1 s on the 9.7 MB corpus, the encode bottleneck) with the
    decoder's incremental model: per symbol, ``cdf[v]``/``cdf[v+1]`` fall
    out of two masked maxes over the row (the row is non-decreasing so
    ``cdf[v] = max_{i<=v} cdf[i]``), the total is a static row read, and
    the adaptation is a masked suffix add (adaptive_linear.rs:33-39).
    The dump sweep is gated by SMEM scalar bounds (min undumped / max
    completed slab across the tile) so out-of-span slabs cost a scalar
    compare instead of a vector reduction.
    """
    cb = params.code_bits
    cmax = params.code_max
    half = params.code_half
    quarter = params.code_one_fourth
    S = params.symbol_count  # 257: row S of the cdf is the running total
    freq_max = params.freq_max

    def kernel(lens_ref, init_ref, syms_ref, out_ref, blen_ref, ovf_ref,
               cdf_s, st_s, ring_s, nw_s, nd_s, acc_s, iv_s, smin_s, smax_s):
        e = pl.program_id(1)
        lens = lens_ref[0, :][None, :]

        @pl.when(e == 0)
        def _init():
            # init col rows past S_PAD are the two-level sweep's coarse
            # boundary row (pallas_decode.init_cum_column) — unused here.
            cdf_s[:, :] = init_ref[0:S_PAD, :] + jnp.zeros((S_PAD, LANES), i32)
            iv_s[0, :] = jnp.zeros((LANES,), u32) + u32(params.code_min)
            iv_s[1, :] = jnp.zeros((LANES,), u32) + u32(cmax)
            iv_s[2, :] = jnp.zeros((LANES,), u32)
            iv_s[3, :] = jnp.zeros((LANES,), u32)
            acc_s[0, :] = jnp.zeros((LANES,), u32)
            acc_s[1, :] = jnp.zeros((LANES,), u32)
            acc_s[2, :] = jnp.zeros((LANES,), u32)
            acc_s[3, :] = jnp.zeros((LANES,), u32)
            nw_s[0, :] = jnp.zeros((LANES,), i32)
            nd_s[0, :] = jnp.zeros((LANES,), i32)
            ring_s[:, :] = jnp.zeros((RING, LANES), u32)

        rows = jax.lax.broadcasted_iota(i32, (S_PAD, LANES), 0)

        def step(ii, t, carry):
            low, high, pending, a0, a1, a2, accbits, ovf, cnt, tot = carry
            active = t < lens
            is_term = t == lens

            sv = syms_ref[pl.ds(ii, 1), :]  # (1, LANES) int32
            cdf = cdf_s[:, :]
            le = rows <= sv
            flo = jnp.max(jnp.where(le, cdf, i32(0)), axis=0)[None, :]
            fhi = jnp.max(
                jnp.where(rows <= sv + i32(1), cdf, i32(0)), axis=0
            )[None, :]
            count = jnp.where(active, tot, i32(1)).astype(u32)
            # Masked model operands keep wide32.muldiv inside its documented
            # bounds (quotient < 2**23) on inactive/terminator steps.
            flo = jnp.where(active, flo, i32(0)).astype(u32)
            fhi = jnp.where(active, fhi, i32(0)).astype(u32)
            # Adaptation (+delta above the symbol while not frozen,
            # adaptive_linear.rs:33-39); the running total rides in a
            # register instead of re-reading row S every step.
            upd = active & (tot < i32(freq_max))
            delta_v = jnp.where(upd, i32(delta), i32(0))
            cdf_s[:, :] = cdf + jnp.where(le, i32(0), delta_v)
            tot = tot + delta_v

            # Interval narrowing (codec.rs:58-60) — exact wide arithmetic;
            # one shared reciprocal replaces both bounds' divides (wide32).
            rngv = high - low + u32(1)
            cnt_r = wide32.rcp_f32(count)
            nlow = low + wide32.muldiv_rcp(rngv, flo, count, cnt_r)
            nhigh = low + wide32.muldiv_rcp(rngv, fhi, count, cnt_r) - u32(1)
            low = jnp.where(active, nlow, low)
            high = jnp.where(active, nhigh, high)

            # Closed-form renorm counts.
            n1 = jnp.where(active, jax.lax.clz(low ^ high).astype(i32) - i32(32 - cb), i32(0))
            n1w = n1.astype(u32)
            low1 = jnp.where(active, (low << n1w) & u32(cmax), low)
            high1 = jnp.where(
                active, ((high << n1w) | ((u32(1) << n1w) - u32(1))) & u32(cmax), high
            )
            aa = jax.lax.clz(~(low1 << u32(32 - cb + 1))).astype(i32)
            bbq = jax.lax.clz(high1 << u32(32 - cb + 1)).astype(i32)
            n3 = jnp.where(active, jnp.minimum(jnp.minimum(aa, bbq), i32(cb - 1)), i32(0))
            n3w = n3.astype(u32)
            low2 = jnp.where(active, (low1 << n3w) & u32(cmax >> 1), low1)
            high2 = jnp.where(
                active,
                (((high1 << n3w) | ((u32(1) << n3w) - u32(1))) & u32(cmax >> 1)) | u32(half),
                high1,
            )

            # Emission piece: [b1][pending opposite][rest] (codec.rs:39-46),
            # or the 2-bit v2 terminator at t == lens.
            emit = active & (n1 > 0)
            prefix = jnp.where(emit, low >> (u32(cb) - n1w), u32(0))
            b1 = prefix >> jnp.maximum(n1 - 1, 0).astype(u32)
            rest = prefix & ((u32(1) << jnp.maximum(n1 - 1, 0).astype(u32)) - u32(1))
            rest_len = jnp.maximum(n1 - 1, 0)
            tq = (low + u32(quarter) - u32(1)) >> u32(cb - 2)
            b1 = jnp.where(is_term, tq >> u32(1), b1)
            rest = jnp.where(is_term, tq & u32(1), rest)
            rest_len = jnp.where(is_term, i32(1), rest_len)
            emit = emit | is_term

            pend_i = pending.astype(i32)
            m1 = jnp.where(emit, rest_len + 1 + pend_i, 0)
            ovf = ovf | (m1 > 64).astype(u32)
            m1 = jnp.minimum(m1, 64)
            phi, plo = _piece64(b1, pend_i, rest, rest_len)
            lhi, llo = _leftalign64(phi, plo, m1)
            a0n, a1n, a2n = _append96(a0, a1, a2, accbits.astype(i32), lhi, llo)
            a0 = jnp.where(emit, a0n, a0)
            a1 = jnp.where(emit, a1n, a1)
            a2 = jnp.where(emit, a2n, a2)
            accbits = accbits + m1.astype(u32)
            pending = (jnp.where(emit, 0, pend_i) + n3).astype(u32)

            # Flush up to two completed words into the dense stage.
            f1 = accbits >= u32(32)
            w0 = jnp.where(f1, a0, u32(0))
            a0 = jnp.where(f1, a1, a0)
            a1 = jnp.where(f1, a2, a1)
            a2 = jnp.where(f1, u32(0), a2)
            accbits = jnp.where(f1, accbits - u32(32), accbits)
            f2 = accbits >= u32(32)
            w1 = jnp.where(f2, a0, u32(0))
            a0 = jnp.where(f2, a1, a0)
            a1 = jnp.where(f2, a2, a1)
            a2 = jnp.where(f2, u32(0), a2)
            accbits = jnp.where(f2, accbits - u32(32), accbits)
            disp = (i32(2) * ii - cnt).astype(u32)
            st_s[pl.ds(2 * ii, 1), :] = w0
            st_s[pl.ds(2 * ii + 1, 1), :] = w1
            st_s[pl.ds(64 + 2 * ii, 1), :] = jnp.where(f1, disp, u32(0))
            st_s[pl.ds(64 + 2 * ii + 1, 1), :] = jnp.where(f2, disp, u32(0))
            st_s[pl.ds(128 + 2 * ii, 1), :] = f1.astype(u32)
            st_s[pl.ds(128 + 2 * ii + 1, 1), :] = f2.astype(u32)
            cnt = cnt + f1.astype(i32) + f2.astype(i32)

            return low2, high2, pending, a0, a1, a2, accbits, ovf, cnt, tot

        carry = (
            iv_s[0, :][None, :], iv_s[1, :][None, :], iv_s[2, :][None, :],
            acc_s[0, :][None, :], acc_s[1, :][None, :], acc_s[2, :][None, :],
            acc_s[3, :][None, :], iv_s[3, :][None, :],
            jnp.zeros((1, LANES), i32),
            cdf_s[S, :][None, :],  # running total (register copy of row S)
        )
        # Statically unrolled symbol loop on TPU (static stage addressing
        # — dynamic VMEM addressing stalls on v5e); rolled fori_loop in
        # interpret mode, where the 32x body would blow up XLA CPU
        # compile time.  Same step function either way.
        t0 = e * EPOCH
        if unroll:
            for ii in range(EPOCH):
                carry = step(ii, t0 + ii, carry)
        else:
            carry = jax.lax.fori_loop(
                0, EPOCH, lambda ii, c: step(ii, t0 + ii, c), carry
            )
        low, high, pending, a0, a1, a2, accbits, ovf, cnt, _tot = carry
        iv_s[0, :] = low[0, :]
        iv_s[1, :] = high[0, :]
        iv_s[2, :] = pending[0, :]
        iv_s[3, :] = ovf[0, :]
        acc_s[0, :] = a0[0, :]
        acc_s[1, :] = a1[0, :]
        acc_s[2, :] = a2[0, :]
        acc_s[3, :] = accbits[0, :]

        # ---- epoch epilogue: compact → rotate → merge → dump ------------
        rows64 = jax.lax.broadcasted_iota(i32, (2 * EPOCH, LANES), 0)
        c_tot = cnt
        val = st_s[0 : 2 * EPOCH, :]
        delta_c = st_s[64 : 64 + 2 * EPOCH, :].astype(i32)
        valid = st_s[128 : 128 + 2 * EPOCH, :] != u32(0)

        def shift_up(a, n, fill):
            rolled = pltpu.roll(a, 2 * EPOCH - n, axis=0)
            keep = rows64 < i32(2 * EPOCH - n)
            return jnp.where(keep, rolled, fill)

        for jph in range(6):  # log2(64) monotone-shift compaction phases
            sh = 1 << jph
            move = valid & (((delta_c >> jph) & 1) == 1)
            m_in = shift_up(move.astype(i32), sh, i32(0)) != 0
            val = jnp.where(m_in, shift_up(val, sh, u32(0)), val)
            delta_c = jnp.where(m_in, shift_up(delta_c, sh, i32(0)), delta_c)
            valid = m_in | (valid & ~move)

        # Rotate compacted words to ring offset nw (mod RING) per lane.
        rot = jnp.concatenate([val, jnp.zeros((RING - 2 * EPOCH, LANES), u32)], axis=0)
        nw0 = nw_s[0, :][None, :]
        for kph in range(RING_PH):  # log2(RING) conditional roll phases
            sh = 1 << kph
            cond = ((nw0 >> kph) & 1) == 1
            rot = jnp.where(cond, pltpu.roll(rot, sh, axis=0), rot)
        ringrows = jax.lax.broadcasted_iota(i32, (RING, LANES), 0)
        tgt = (ringrows - nw0) & i32(RING - 1)
        write = tgt < c_tot
        ring_s[:, :] = jnp.where(write, rot, ring_s[:, :])
        nw_s[0, :] = (nw0 + c_tot)[0, :]

        def run_dumps(full_tail):
            # SMEM-gated statically-unrolled slab sweep: slabs outside the
            # tile-wide [min undumped, max completed) span cost one scalar
            # compare; in-span slabs with no dumping lane cost one vector
            # any-reduction.
            limit = (
                nw_s[0, :][None, :] + (i32(SLAB - 1) if full_tail else i32(0))
            ) >> i32(SLAB_SH)
            # Lanes with nothing to dump this sweep (api padding lanes,
            # tiny blocks: limit == 0) must not pin the span floor to 0.
            smin_s[0, 0] = jnp.min(
                jnp.where(limit[0, :] > 0, nd_s[0, :], i32(n_words // SLAB))
            )
            smax_s[0, 0] = jnp.max(limit[0, :])
            for p in range(n_words // SLAB):

                @pl.when((smin_s[0, 0] <= p) & (p < smax_s[0, 0]))
                def _(p=p, limit=limit):
                    m = (nd_s[0, :][None, :] == p) & (p < limit)

                    @pl.when(jnp.any(m))
                    def _(p=p, m=m):
                        slot = (p % (RING // SLAB)) * SLAB
                        blk = ring_s[slot : slot + SLAB, :]
                        out_ref[p * SLAB : (p + 1) * SLAB, :] = jnp.where(
                            m, blk, out_ref[p * SLAB : (p + 1) * SLAB, :]
                        )
                        nd_s[0, :] = jnp.where(m[0, :], p + i32(1), nd_s[0, :])

        run_dumps(False)

        @pl.when(e == n_epochs - 1)
        def _finish():
            accb = acc_s[3, :][None, :]
            a0v = acc_s[0, :][None, :]
            nw0f = nw_s[0, :][None, :]
            has_tail = accb > u32(0)
            tgtrow = nw0f & i32(RING - 1)
            m = (ringrows == tgtrow) & has_tail
            ring_s[:, :] = jnp.where(m, a0v, ring_s[:, :])
            nw_s[0, :] = (nw0f + has_tail.astype(i32))[0, :]
            bits = nw0f.astype(i32) * i32(32) + accb.astype(i32)
            blen_ref[0, :] = ((bits + i32(7)) >> i32(3))[0, :]
            ovf_ref[0, :] = iv_s[3, :].astype(i32)
            run_dumps(True)

    return kernel


@functools.partial(jax.jit, static_argnames=("params", "n_words", "delta"))
def _encode_pallas_m_jit(syms_t, lens, init_col, params: Parameters, n_words: int,
                         delta: int):
    if n_words % SLAB:  # run_dumps sweeps whole slabs; a direct caller
        raise ValueError("n_words must be a multiple of SLAB (use the wrapper)")
    k_pad, b = syms_t.shape
    n_tiles = b // LANES
    n_epochs = k_pad // EPOCH
    interp = jax.default_backend() == "cpu"
    kernel = _encode_kernel_m(params, n_words, n_epochs, delta, unroll=not interp)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles, n_epochs),
        interpret=interp,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((1, LANES), lambda i, e: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((S_EXT, 1), lambda i, e: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((EPOCH, LANES), lambda i, e: (e, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n_words, LANES), lambda i, e: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i, e: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i, e: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_words, b), jnp.uint32),
            jax.ShapeDtypeStruct((1, b), jnp.int32),
            jax.ShapeDtypeStruct((1, b), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((S_PAD, LANES), i32),  # cdf
            pltpu.VMEM((192, LANES), u32),  # stage
            pltpu.VMEM((RING, LANES), u32),  # ring
            pltpu.VMEM((1, LANES), i32),  # nw
            pltpu.VMEM((1, LANES), i32),  # nd
            pltpu.VMEM((4, LANES), u32),  # acc
            pltpu.VMEM((4, LANES), u32),  # low, high, pending, ovf
            pltpu.SMEM((1, 1), i32),  # dump span lo
            pltpu.SMEM((1, 1), i32),  # dump span hi
        ],
    )(lens, init_col, syms_t)


def encode_blocks_pallas_m(syms, lens, init_cum, params: Parameters, n_words: int,
                           delta: int = 1):
    """Model-in-kernel encoder: drop-in for rank precompute + kernel.

    Args: ``(B, K)`` uint8/int32 symbols, ``(B,)`` lens, the initial
    cumulative row ``(symbol_count + 1,)``.  Returns the same triple as
    :func:`encode_blocks_pallas`, bit-identical streams.
    """
    if not (params.fits_u32 or params.fits_wide32):
        raise ValueError("pallas encoder requires fits_u32 or fits_wide32 params")
    import numpy as np

    from .pallas_decode import init_cum_column

    b, k = syms.shape
    b_pad = ((b + LANES - 1) // LANES) * LANES
    k_pad = ((k + 1 + EPOCH - 1) // EPOCH) * EPOCH
    nw_pad = ((n_words + SLAB - 1) // SLAB) * SLAB
    with jax.enable_x64(False):
        syms_t = jnp.pad(
            syms.astype(jnp.int32), ((0, b_pad - b), (0, k_pad - k))
        ).T  # (K_pad, B)
        lens_p = jnp.pad(lens.astype(jnp.int32), (0, b_pad - b),
                         constant_values=-1).reshape(1, b_pad)
        init_col = jnp.asarray(init_cum_column(np.asarray(init_cum), params))
        words_t, blen, ovf = _encode_pallas_m_jit(
            syms_t, lens_p, init_col, params, nw_pad, int(delta)
        )
        return words_t.T[:b, :n_words], blen[0, :b], ovf[0, :b].astype(bool)


def encode_blocks_ranked(syms, lens, init_cum, params: Parameters, n_words: int,
                         delta: int = 1):
    """Production encode: model-values kernel + streaming coder kernel.

    On TPU the per-position (lo, hi) model values come from the
    model-values Pallas kernel (:mod:`redux_tpu.ops.pallas_model` — the
    decoder's dense-row sweep run encode-side over the known symbols);
    on CPU from the closed-form rank precompute
    (:func:`redux_tpu.ops.ranks.precompute_encode_model`).  The coder
    kernel then consumes them with NO model state in its loop, computing
    the running totals from their closed form in-kernel.  All paths are
    bit-identical (kbench differential + tests/test_pallas_encode.py,
    tests/test_pallas_model.py).

    Costs ~8 bytes of HBM per input byte for the lo/hi planes; callers
    batching >~100 MB per call should chunk lanes (api.encode does, see
    REDUX_TPU_ENC_CHUNK_MB), and callers must NOT queue several of these
    asynchronously (each in-flight call pins its planes in HBM).

    Same signature/returns as :func:`encode_blocks_pallas_m`.
    """
    # x64 off for the whole trace: the Pallas kernel has no 64-bit types,
    # and every rank quantity fits int32 (counts < 2**20).  The env
    # variant string keys the jit cache on every knob the trace reads
    # (fused/model-sweep selection, WSEL, probes) so toggling one after a
    # first compile re-traces instead of reusing a stale kernel.
    import os as _os

    from .pallas_model import _env_variant as _model_variant

    variant = _os.environ.get("REDUX_TPU_ENC_FUSED", "0") + "|" + _model_variant()
    with jax.enable_x64(False):
        return _encode_ranked_fused_jit(
            syms, lens, init_cum, params, n_words, int(delta), variant
        )


@functools.partial(
    jax.jit, static_argnames=("params", "n_words", "delta", "variant")
)
def _encode_ranked_fused_jit(syms, lens, init_cum, params, n_words, delta,
                             variant: str = ""):
    """The whole production encode under ONE jit.

    On TPU: the Pallas MODEL-VALUES kernel (the decoder's dense-row
    sweep run encode-side — ops/pallas_model.py; ~4x the XLA rank
    precompute it replaced, round-4 post-mortem) feeds the streaming
    coder kernel in the shared transposed plane layout — symbols are
    padded/transposed once and the (k_pad, b) lo/hi planes flow straight
    into the coder with no intermediate relayouts.

    On CPU (tests, virtual meshes): the closed-form XLA rank precompute
    — faster than interpret mode there, and the kernel-vs-ranks
    differential tests pin the two derivations against each other.
    """
    from .ranks import precompute_encode_model

    init_total = jnp.asarray(init_cum, jnp.int32)[-1]
    if jax.default_backend() == "cpu":
        lo, hi, _tot, _el, _eh, _et = precompute_encode_model(
            syms, lens, init_cum, params.freq_max, delta=delta, with_tot=False
        )
        return encode_blocks_pallas(
            lo, hi, lens, init_total, params, n_words, delta
        )

    from .pallas_decode import init_cum_column as _icol
    from .pallas_model import LANES as MLANES
    from .pallas_model import _model_lohi_jit

    b, k = syms.shape
    # One lane geometry serving both kernels (model tile x coder tile).
    import math as _math

    q = _math.lcm(MLANES, LANES)
    b_pad = ((b + q - 1) // q) * q
    # The coder codes the 2-bit terminator at t == lens, so its planes
    # extend one position past k; the model kernel only needs k.
    k_pad = ((k + 1 + EPOCH - 1) // EPOCH) * EPOCH
    syms_t = jnp.pad(
        syms.astype(jnp.int32), ((0, b_pad - b), (0, k_pad - k))
    ).T  # (k_pad, b_pad): the single transpose of the pipeline
    lens_p = jnp.pad(lens.astype(jnp.int32), (0, b_pad - b),
                     constant_values=-1).reshape(1, b_pad)
    icol = _build_init_col(init_cum, params)
    tf = jnp.maximum(
        (jnp.int32(params.freq_max) - init_total + (delta - 1))
        // jnp.int32(delta),
        0,
    )
    consts = jnp.stack([init_total, tf]).reshape(1, 2)
    nw_pad = ((n_words + SLAB - 1) // SLAB) * SLAB
    import os as _os

    if _os.environ.get("REDUX_TPU_ENC_FUSED", "0") != "0":
        # Single fused kernel: model sweep inline with the coder — no
        # lo/hi HBM planes.  Slope-timed NEGATIVE result on v5e: 4.0 ms
        # vs the two-kernel 3.2-4.1 ms band (no overlap materializes —
        # the coder chain consumes the same position's flo/fhi, so the
        # schedule serializes, and the big fused body adds register
        # pressure).  Kept env-tunable with differential coverage; its
        # ~8 B/B HBM saving could matter on memory-tight configs.
        words_t, blen, ovf = _encode_fused_model_jit(
            syms_t, lens_p, icol, consts, params, nw_pad, int(delta)
        )
    else:
        # Two-kernel pipeline (the production path).
        lens_model = jnp.maximum(lens_p, 0)  # pad lanes: -1 -> 0 (no work)
        lo_t, hi_t = _model_lohi_jit(
            syms_t, lens_model, icol, tf.reshape(1, 1), params, k, int(delta)
        )
        words_t, blen, ovf = _encode_pallas_jit(
            lo_t, hi_t, consts, lens_p, params, nw_pad, int(delta)
        )
    return words_t.T[:b, :n_words], blen[0, :b], ovf[0, :b].astype(bool)


def _build_init_col(init_cum, params):
    """(S_EXT, 1)-shaped init column as a traced array.

    The traced twin of :func:`redux_tpu.ops.pallas_decode.init_cum_column`:
    fine rows [0, S_PAD) then the coarse bucket-boundary row [S_PAD,
    S_EXT) for the two-level sweep.
    """
    from .pallas_decode import BS as _BS
    from .pallas_decode import C_PAD as _CP
    from .pallas_decode import NB as _NB
    from .pallas_decode import S_EXT as _SE
    from .pallas_decode import S_PAD as _SP

    ic = jnp.asarray(init_cum, jnp.int32)
    pad = jnp.full((_SP - ic.shape[0],), jnp.int32(params.freq_max))
    fine = jnp.concatenate([ic, pad])
    coarse = jnp.concatenate([
        fine[0 : _NB * _BS : _BS],
        jnp.full((_CP - _NB,), jnp.int32(params.freq_max)),
    ])
    return jnp.concatenate([fine, coarse]).reshape(_SE, 1)
