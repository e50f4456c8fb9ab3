"""Pallas TPU decode kernel: the whole per-block symbol loop on-chip.

The XLA `lax.scan` decoder (:func:`redux_tpu.ops.coder.decode_blocks`)
pays a kernel launch plus an HBM round-trip of the ``(B, 258)`` model
state per symbol — the measured round-1 bottleneck (0.04 GB/s).  This
kernel keeps EVERYTHING resident in VMEM for a tile of LANES blocks
(default 1024, laid out as G = LANES/128 sublane-packed groups of 128
lanes — the (rows, G, 128) layout keeps the per-lane interval/bit math
on full vregs instead of 1/8-occupied (1, LANES) rows) and runs all
``K`` symbol steps inside one kernel invocation:

* **Model state**: one dense cumulative row per lane, ``(264, G, 128)``
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
  bitstreams are consumed through a 4-slab ring: each lane owns four
  32-word slabs of its stream inside a ``(128, G, 128)`` VMEM ring.  Word
  pulls one-hot-select from the ring (pure compare/select/reduce).
  Every second 32-step epoch (64 steps consume at most ``64 *
  code_bits`` bits < 2 slabs) a refill sweep tops every lane back up to
  4 resident slabs.  The sweep is a STATICALLY UNROLLED walk over
  ring-sized GROUPS of 4 slabs — measured: any dynamically-addressed
  VMEM block access stalls ~1.4 us on v5e, so everything is static
  slices.  A group of 4 consecutive slabs maps exactly onto the whole
  ring (``(4g + j) mod 4 = j``), so each executed group is ONE 128-row
  masked merge; groups outside the scalar [min-needed, max-wanted) span
  are skipped by ``pl.when`` on SMEM scalars for free.  Callers sort
  lanes by stream length so a tile's spans stay tight (api.decode does).
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

import os as _os
# Total lanes per kernel program.  Internally laid out as (G, 128): the
# sublane dimension carries G = LANES/128 independent lane GROUPS, so the
# per-lane interval/bit math runs on full (G, 128) vregs instead of
# 1/8-occupied (1, LANES) rows — measured the decisive decode win (the
# scalar chain was stall-bound; see docs/DESIGN_NOTES.md).
LANES = int(_os.environ.get("REDUX_TPU_DLANES",
                            _os.environ.get("REDUX_TPU_LANES", "1024")))
if LANES <= 0 or LANES % 128:
    raise ValueError(
        f"REDUX_TPU_DLANES/REDUX_TPU_LANES must be a positive multiple of 128 "
        f"(got {LANES}); set before first import — later changes have no effect"
    )
LN = 128  # hardware lane width (minor dim)
G = max(1, LANES // LN)  # sublane-packed lane groups
# Independent lane tiles interleaved per kernel program (hardware only):
# one phase's serial interval/renorm chain can hide under the other's
# model sweep (see _decode_kernel).  Default 1: once the reciprocal
# ladder removed the chain's divide stalls, slope-timed A/B shows no
# phase-interleave gain — kept as an env-tunable experiment.
PHASES = int(_os.environ.get("REDUX_TPU_DECODE_PHASES", "1"))
if PHASES < 1:
    raise ValueError(f"REDUX_TPU_DECODE_PHASES must be >= 1 (got {PHASES})")
EPOCH = 32  # symbols per inner loop
SLAB = 32  # words per stream slab
RING_SLABS = 4  # resident slabs per lane; refill every 2 epochs
S_PAD = 264  # model rows incl. padding (258 live), multiple of 8
# Two-level (bucketed) model geometry: the coarse row holds the cdf at
# every bucket boundary, C[j] = cdf[j*BS] (33 live boundaries for the
# 258-row model), padded to a sublane multiple with freq_max rows.  The
# VPU-shaped analog of the reference's Fenwick hierarchy
# (adaptive_tree.rs:63-136): the coarse sweep localizes the symbol to
# one 8-row bucket so the full-width fine pass needs only ~5 vector ops
# per row (fused previous-symbol update + bucket-window select) instead
# of the flat sweep's ~9 (compare + count + flo/fhi reduces + update).
BS = 8  # bucket size (rows per bucket) — one sublane tile
NB = S_PAD // BS  # buckets (33)
C_PAD = ((NB + 7) // 8) * 8  # coarse rows incl. padding (40)
S_EXT = S_PAD + C_PAD  # extended init column: fine rows then coarse rows

i32 = jnp.int32
u32 = jnp.uint32


def _decode_kernel(params: Parameters, k: int, delta: int, wn: int,
                   phases: int = 1, unroll: bool = True):
    """Kernel body for static (params, k, delta, words-per-lane).

    ``unroll`` statically unrolls the per-epoch symbol loop (static VMEM
    stage addressing — dynamic addressing stalls on v5e).  Interpret-mode
    callers pass False: the 32x bigger body makes XLA CPU compiles blow
    up, and the rolled ``fori_loop`` runs the identical step function.

    ``phases`` > 1 runs that many INDEPENDENT lane tiles inside one
    program, their per-symbol step bodies emitted interleaved.  The
    round-3 probe attribution (BASELINE.md) showed the per-step model
    sweep (~48%) and the serially-dependent interval/renorm/bit chain
    (~45%) run additively — the chain is latency-bound (a few dozen
    dependent single-vreg ops), so a second phase's sweep fills its
    stall slots.  Each phase owns a full (G, LN) lane tile and its own
    cdf/ring/stage scratches (no aliasing between the chains).
    """
    cb = params.code_bits
    S = params.symbol_count  # 257: row S of the cdf is the running total
    freq_max = params.freq_max
    n_slabs = wn // SLAB
    n_epochs = (k + EPOCH - 1) // EPOCH
    cmax = params.code_max
    half = params.code_half

    # Perturbation probes (dev-only, via REDUX_TPU_DECODE_PROBE):
    # deliberately WRONG variants that skip one stage so its share of
    # the step time can be measured on hardware.  Never set in
    # production; roundtrip checks fail loudly when it is.
    probe = _os.environ.get("REDUX_TPU_DECODE_PROBE", "")
    # Sweep selection (bit-identical semantics): "bucket" on hardware
    # (the two-level coarse/fine sweep — fewest vector ops per symbol),
    # "full" in interpret mode (vectorized numpy ops beat a rolled loop
    # on CPU).  "chunk" keeps the round-4 flat chunked sweep for A/B.
    # Env forces any of the three.
    sweep_mode = _os.environ.get(
        "REDUX_TPU_DECODE_SWEEP", "bucket" if unroll else "full"
    )
    # "bucketsplit": the two-level sweep with the model update emitted as
    # a SEPARATE dependency-free pass at the END of the step (after the
    # serial interval/renorm/read chain) instead of fused with the
    # window select.  Costs one extra row load per symbol, but the
    # update's ~5 slots/row have zero data dependence on the chain, so
    # an instruction scheduler willing to interleave adjacent regions
    # can fill the chain's latency stalls with them.  A/B experiment for
    # the measured additivity of sweep and chain (BASELINE.md).
    bucket = sweep_mode in ("bucket", "bucketsplit")
    bsplit = sweep_mode == "bucketsplit"

    def _make_phase(init_ref, lens_ref, words_ref, out_ref,
                    cdf_s, coarse_s, ring_s, stage_s, nl_s, smin_s, smax_s):
        """Closures for one phase's model/stream/interval state machine."""
        lens = lens_ref[:, :]

        def init():
            # All per-lane state is (G, LN); row-indexed: (rows, G, LN).
            cdf_s[:, :, :] = init_ref[0:S_PAD, :, :] + jnp.zeros(
                (S_PAD, G, LN), i32
            )
            if bucket:
                coarse_s[:, :, :] = init_ref[S_PAD:S_EXT, :, :] + jnp.zeros(
                    (C_PAD, G, LN), i32
                )
            # Ring init: slabs 0..3 of every lane (uniform static copies).
            ring_s[:, :, :] = words_ref[0 : RING_SLABS * SLAB, :, :]
            nl_s[:, :] = jnp.full((G, LN), RING_SLABS, i32)  # next slab to load

        def pull_word(wq):
            """ring[wq mod 128] per lane — two-level select over the ring.

            Level 1 picks the lane's slab with RING_SLABS (SLAB, G, LN)
            selects; level 2 one-hot-reduces within the 32-row slab —
            ~3x fewer vector ops than a flat 128-row one-hot.  The
            reduction runs on an i32 bitcast view (Mosaic has no
            unsigned reductions); exactly one row is selected, so the
            sum reproduces the bit pattern regardless of sign.
            """
            wql = wq & i32(RING_SLABS * SLAB - 1)
            slab = (wql >> i32(5))[None]
            ring_i = jax.lax.bitcast_convert_type(ring_s[:, :, :], i32)
            acc = ring_i[0:SLAB]
            for j in range(1, RING_SLABS):
                acc = jnp.where(slab == j, ring_i[j * SLAB : (j + 1) * SLAB], acc)
            sub_rows = jax.lax.broadcasted_iota(i32, (SLAB, G, LN), 0)
            m = sub_rows == (wql & i32(SLAB - 1))[None]
            picked = jnp.sum(jnp.where(m, acc, i32(0)), axis=0, dtype=i32)
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

        rows_coarse = jax.lax.broadcasted_iota(i32, (C_PAD, G, LN), 0)
        rows_bucket = jax.lax.broadcasted_iota(i32, (BS, G, LN), 0)

        def step(t, stage_row, carry):
            # Bucket mode pipelines the model update: step t lands symbol
            # t-1's suffix add during the same pass that selects step t's
            # bucket window, so the model rows are loaded/stored once per
            # step instead of once for the sweep plus once for the
            # update.  (sym_prev, jb_prev, dv_prev) ride in the carry;
            # dv_prev = 0 at t = 0 and on frozen/inactive steps makes the
            # landed update a no-op.
            if bucket and not bsplit:
                (low, high, z, cur, avail, wq, count_i,
                 sym_prev, jb_prev, dv_prev) = carry
            else:
                low, high, z, cur, avail, wq, count_i = carry
            active = t < lens

            rngv = high - low + u32(1)
            count = count_i.astype(u32)
            # One reciprocal per divisor per step (wide32 rcp variants):
            # count divides BOTH interval bounds, and issuing cnt_r here
            # lets its divide latency hide under the model sweep below.
            rng_r = wide32.rcp_f32(rngv)
            cnt_r = wide32.rcp_f32(count)
            # value = ((z+1)*count - 1) // rng  (codec.rs:131, z = pending-low)
            value = wide32.muldiv_sub1_rcp(z + u32(1), count, rngv, rng_r)
            # min via i32 (Mosaic lacks unsigned min); both < 2**20.
            value = jnp.minimum(value.astype(i32), count_i - i32(1))
            if probe == "nosweep":
                sym = value & i32(255)
                jb = sym >> i32(3)
                flo = value.astype(u32)
                fhi = flo + u32(1)
                delta_v = jnp.where(active, i32(delta), i32(0))
            elif bucket:
                # Two-level sweep.  Invariants (see init_cum_column):
                # C[j] = cdf[j*BS] exactly, coarse/fine pads >= every
                # live entry and never counted.  The coarse sweep yields
                # the symbol's bucket jb (coarse count - 1: C[jb] <=
                # value < C[jb+1], so lc >= 1 below) and, via the masked
                # min over the not-counted rows, cdf[(jb+1)*BS] — the
                # fhi value whenever the whole bucket counts (lc == BS).
                upd = active & (count_i < i32(freq_max))
                delta_v = jnp.where(upd, i32(delta), i32(0))
                C = coarse_s[:, :, :]
                if bsplit:
                    newC = C  # already current: updates land at step end
                else:
                    newC = C + jnp.where(
                        rows_coarse > jb_prev[None], dv_prev[None], i32(0)
                    )
                    if probe != "noupdate":
                        coarse_s[:, :, :] = newC
                bC = newC <= value[None]
                jb = jnp.sum(bC.astype(i32), axis=0, dtype=i32) - i32(1)
                cfhi = jnp.min(jnp.where(bC, i32(0x7FFFFFFF), newC), axis=0)
                # Fused fine pass: land update t-1, one-hot bucket jb's
                # window.  Every lane matches exactly one chunk (jb in
                # [0, NB) for any in-range value), so the 0x7FFFFFFF init
                # never survives the min-merge below.  WSEL round-robin
                # select chains break the NB-long serial where-dependency
                # (the former critical path of the step) into chains of
                # ~NB/WSEL, merged by jnp.minimum — valid because
                # unmatched accumulators keep the sentinel and every live
                # cdf entry is < 2**31.
                WSEL = int(_os.environ.get("REDUX_TPU_WSEL", "1"))
                if WSEL < 1:
                    raise ValueError(f"REDUX_TPU_WSEL must be >= 1 (got {WSEL})")
                wacc = [jnp.full((BS, G, LN), 0x7FFFFFFF, i32)
                        for _ in range(WSEL)]
                for c in range(NB):
                    ch = cdf_s[c * BS : (c + 1) * BS, :, :]
                    if not bsplit and probe != "noupdate":
                        m = rows_bucket > (sym_prev - i32(c * BS))[None]
                        ch = ch + jnp.where(m, dv_prev[None], i32(0))
                        cdf_s[c * BS : (c + 1) * BS, :, :] = ch
                    if probe != "noselect":
                        s = c % WSEL
                        wacc[s] = jnp.where((jb == c)[None], ch, wacc[s])
                w = wacc[0]
                for s in range(1, WSEL):
                    w = jnp.minimum(w, wacc[s])
                bw = w <= value[None]
                lc = jnp.sum(bw.astype(i32), axis=0, dtype=i32)
                sym = jb * i32(BS) + lc - i32(1)
                flo = jnp.max(jnp.where(bw, w, i32(0)), axis=0).astype(u32)
                fhi = jnp.minimum(
                    jnp.min(jnp.where(bw, i32(0x7FFFFFFF), w), axis=0), cfhi
                ).astype(u32)
            elif sweep_mode != "full":
                # DEFAULT sweep: rolled single pass with (CH, G, LN)
                # chunks and carried accumulators — never materializes the
                # full (S_PAD, G, LN) mask, so the register footprint
                # stays small enough for phase interleaving (the full-mask
                # sweep spills ~33 vregs per phase; measured slower on
                # hardware since the round-4 reciprocal chain fix).
                upd = active & (count_i < i32(freq_max))
                delta_v = jnp.where(upd, i32(delta), i32(0))
                CH = int(_os.environ.get("REDUX_TPU_DECODE_CH", "2"))
                assert S_PAD % CH == 0, "chunk rows must divide S_PAD"
                # W independent accumulator sets (round-robin over chunks)
                # break the n_chunks-long accumulate chains into W shorter
                # independent ones; combined at the end.
                W = int(_os.environ.get("REDUX_TPU_DECODE_ACCW", "1"))
                acc_sym = [jnp.zeros((G, LN), i32) for _ in range(W)]
                acc_flo = [jnp.zeros((G, LN), i32) for _ in range(W)]
                acc_fhi = [jnp.full((G, LN), 0x7FFFFFFF, i32) for _ in range(W)]
                for c in range(S_PAD // CH):
                    w = c % W
                    ch = cdf_s[c * CH : (c + 1) * CH, :, :]
                    bch = ch <= value[None]
                    acc_sym[w] = acc_sym[w] + jnp.sum(
                        bch.astype(i32), axis=0, dtype=i32
                    )
                    acc_flo[w] = jnp.maximum(
                        acc_flo[w], jnp.max(jnp.where(bch, ch, i32(0)), axis=0)
                    )
                    acc_fhi[w] = jnp.minimum(
                        acc_fhi[w],
                        jnp.min(jnp.where(bch, i32(0x7FFFFFFF), ch), axis=0),
                    )
                    if probe != "noupdate":
                        cdf_s[c * CH : (c + 1) * CH, :, :] = ch + jnp.where(
                            bch, i32(0), delta_v[None]
                        )
                for w in range(1, W):
                    acc_sym[0] = acc_sym[0] + acc_sym[w]
                    acc_flo[0] = jnp.maximum(acc_flo[0], acc_flo[w])
                    acc_fhi[0] = jnp.minimum(acc_fhi[0], acc_fhi[w])
                sym = acc_sym[0] - i32(1)
                flo = acc_flo[0].astype(u32)
                fhi = acc_fhi[0].astype(u32)
            else:
                cdf = cdf_s[:, :, :]
                b = cdf <= value[None]
                sym = jnp.sum(b.astype(i32), axis=0, dtype=i32) - i32(1)
                flo = jnp.max(jnp.where(b, cdf, i32(0)), axis=0).astype(u32)
                # Sentinel must exceed EVERY cumulative entry: the freeze can
                # overshoot to freq_max + delta - 1 (tests/test_freeze_overshoot).
                fhi = jnp.min(
                    jnp.where(b, i32(freq_max + delta), cdf), axis=0
                ).astype(u32)
                # Adaptation: +delta above the symbol while not frozen
                # (adaptive_linear.rs:33-39); the running total rides in a
                # register instead of re-reading row S every step.
                upd = active & (count_i < i32(freq_max))
                delta_v = jnp.where(upd, i32(delta), i32(0))
                if probe != "noupdate":
                    cdf_s[:, :, :] = cdf + jnp.where(b, i32(0), delta_v[None])
            count_i = count_i + delta_v

            # Narrow (codec.rs:58-60); z moves with low.
            dlo = wide32.muldiv_rcp(rngv, flo, count, cnt_r)
            dhi = wide32.muldiv_rcp(rngv, fhi, count, cnt_r)
            nlow = low + dlo
            nhigh = low + dhi - u32(1)
            nz = z - dlo
            low = jnp.where(active, nlow, low)
            high = jnp.where(active, nhigh, high)
            z = jnp.where(active, nz, z)

            # Closed-form renorm: n = n1 + n3 bits consumed; z <- (z<<n)|bits.
            # Only the shift COUNTS are masked for inactive lanes: with
            # n1 = n3 = 0 every transform below is an identity under the
            # coder invariants (low < half <= high, both <= code_max), so
            # the per-value active-selects would be dead ops on the
            # critical dependency chain.
            n1 = jnp.where(active, jax.lax.clz(low ^ high).astype(i32) - i32(32 - cb), i32(0))
            n1w = n1.astype(u32)
            low1 = (low << n1w) & u32(cmax)
            high1 = ((high << n1w) | ((u32(1) << n1w) - u32(1))) & u32(cmax)
            a = jax.lax.clz(~(low1 << u32(32 - cb + 1))).astype(i32)
            bb = jax.lax.clz(high1 << u32(32 - cb + 1)).astype(i32)
            n3 = jnp.where(active, jnp.minimum(jnp.minimum(a, bb), i32(cb - 1)), i32(0))
            n3w = n3.astype(u32)
            low = (low1 << n3w) & u32(cmax >> 1)
            high = (((high1 << n3w) | ((u32(1) << n3w) - u32(1))) & u32(cmax >> 1)) | u32(half)
            n = n1 + n3
            if probe == "noread":
                bits = n.astype(u32)
            else:
                bits, (cur, avail, wq) = read_bits((cur, avail, wq), n)
            z = jnp.where(active, ((z << n.astype(u32)) | bits) & u32(cmax), z)

            stage_s[pl.ds(stage_row, 1), :, :] = jnp.where(active, sym, i32(0))[None]
            if bsplit and probe != "noupdate":
                # Trailing update landing: zero data dependence on the
                # chain above — pure stall-filler material for the
                # scheduler.  dv = 0 on inactive/frozen lanes.
                coarse_s[:, :, :] = newC + jnp.where(
                    rows_coarse > jb[None], delta_v[None], i32(0)
                )
                for c in range(NB):
                    chv = cdf_s[c * BS : (c + 1) * BS, :, :]
                    mu = rows_bucket > (sym - i32(c * BS))[None]
                    cdf_s[c * BS : (c + 1) * BS, :, :] = chv + jnp.where(
                        mu, delta_v[None], i32(0)
                    )
            if bucket and not bsplit:
                # Inactive/frozen steps carry dv = 0, so garbage sym/jb
                # on those lanes land a no-op next step.
                return (low, high, z, cur, avail, wq, count_i,
                        sym, jb, delta_v)
            return low, high, z, cur, avail, wq, count_i

        def store_epoch(e):
            # Store this epoch's symbols (one 32-row uint8 block).
            out_ref[pl.ds(e * EPOCH, EPOCH), :, :] = stage_s[:, :, :].astype(
                jnp.uint8
            )

        ring_rows = jax.lax.broadcasted_iota(i32, (RING_SLABS * SLAB, G, LN), 0)

        def refill_sweep(cursor_slab):
            # Statically-unrolled GROUP walk (4 slabs = one full ring image
            # per group): no dynamic VMEM addressing anywhere.  A lane
            # loads every slab in [nl, cursor + RING_SLABS) — overwriting
            # only ring slots whose old slab is already consumed (slab - 4
            # < cursor).  Groups outside the scalar span are skipped.
            want_hi = cursor_slab + i32(RING_SLABS)  # exclusive
            smin_s[0, 0] = jnp.min(nl_s[:, :])
            smax_s[0, 0] = jnp.max(want_hi)
            n_groups = n_slabs // RING_SLABS
            for g in range(1, n_groups):
                gstart, gend = g * RING_SLABS, (g + 1) * RING_SLABS

                @pl.when((smin_s[0, 0] < gend) & (smax_s[0, 0] > gstart))
                def _(g=g, gstart=gstart, gend=gend):
                    nl = nl_s[:, :][None]
                    slab_row = i32(gstart) + (ring_rows >> i32(5))
                    m = (slab_row >= nl) & (slab_row < want_hi[None])
                    blk = words_ref[
                        g * RING_SLABS * SLAB : (g + 1) * RING_SLABS * SLAB, :, :
                    ]
                    ring_s[:, :, :] = jnp.where(m, blk, ring_s[:, :, :])
                    hit = (nl[0] < gend) & (want_hi > gstart)
                    new_nl = jnp.maximum(nl[0], jnp.minimum(want_hi, i32(gend)))
                    nl_s[:, :] = jnp.where(hit, new_nl, nl[0])

        def prime():
            # Prime: z = first code_bits bits (codec.rs:124-127).
            cur0 = jnp.zeros((G, LN), u32)
            avail0 = jnp.zeros((G, LN), i32)
            wq0 = jnp.zeros((G, LN), i32)
            z0, (cur0, avail0, wq0) = read_bits(
                (cur0, avail0, wq0), jnp.full((G, LN), cb, i32)
            )
            base = (
                jnp.zeros((G, LN), u32),  # low  (codec.rs:30)
                jnp.full((G, LN), cmax, u32),  # high (codec.rs:31)
                z0,
                cur0,
                avail0,
                wq0,
                cdf_s[S, :, :],  # running total (register copy of row S)
            )
            if bucket and not bsplit:
                # Pipelined-update state: dv_prev = 0 makes the first
                # step's landed update a no-op.
                zi = jnp.zeros((G, LN), i32)
                return base + (zi, zi, zi)
            return base

        return init, prime, step, store_epoch, refill_sweep

    def kernel(*refs):
        # Operand layout: init | lens x phases | words x phases |
        # out x phases | (cdf, coarse, ring, stage, nl, smin, smax) x phases.
        init_ref = refs[0]
        lens_refs = refs[1 : 1 + phases]
        words_refs = refs[1 + phases : 1 + 2 * phases]
        out_refs = refs[1 + 2 * phases : 1 + 3 * phases]
        sc = refs[1 + 3 * phases :]
        ph = [
            _make_phase(
                init_ref, lens_refs[p], words_refs[p], out_refs[p],
                *sc[7 * p : 7 * (p + 1)]
            )
            for p in range(phases)
        ]
        for init, _, _, _, _ in ph:
            init()
        carries = tuple(prime() for _, prime, _, _, _ in ph)

        def epoch(e, carries):
            # Steps past k are masked by ``t < lens`` (lens <= k), so the
            # tail epoch needs no bound.  The phase step bodies are
            # emitted interleaved (A_ii, B_ii, A_ii+1, ...): the chains
            # are independent, so the scheduler overlaps one phase's
            # serial interval chain with the other's model sweep.
            t0 = e * EPOCH

            def all_steps(ii, cs):
                return tuple(
                    ph[p][2](t0 + ii, ii, cs[p]) for p in range(phases)
                )

            if unroll:
                for ii in range(EPOCH):
                    carries = all_steps(ii, carries)
            else:
                carries = jax.lax.fori_loop(0, EPOCH, all_steps, carries)
            for _, _, _, store_epoch, _ in ph:
                store_epoch(e)

            # Refill every second epoch: 64 steps consume < 2 slabs, and
            # the sweep tops lanes back up to RING_SLABS resident slabs.
            @pl.when((e & 1) == 1)
            def _():
                for p in range(phases):
                    ph[p][4](carries[p][5] >> i32(5))
            return carries

        jax.lax.fori_loop(0, n_epochs, epoch, carries)

    return kernel


def _env_variant() -> str:
    """Every env knob the decode kernel trace reads, as one string.

    Passed as a STATIC jit argument by the wrappers below so toggling a
    knob after a first compile gets a fresh trace instead of a silent
    stale-cache hit (jit caches key only on shapes and statics — the
    kernel builder reads the env at trace time)."""
    keys = ("REDUX_TPU_DECODE_SWEEP", "REDUX_TPU_DECODE_CH",
            "REDUX_TPU_DECODE_ACCW", "REDUX_TPU_WSEL",
            "REDUX_TPU_DECODE_PROBE")
    return "|".join(_os.environ.get(k, "") for k in keys)


@functools.partial(
    jax.jit, static_argnames=("params", "k", "delta", "phases", "variant")
)
def _decode_pallas_jit(words_t, lens, init_col, params: Parameters, k: int,
                       delta: int, phases: int | None = None,
                       variant: str = ""):
    wn, b = words_t.shape
    n_tiles = b // LANES
    k_pad = ((k + EPOCH - 1) // EPOCH) * EPOCH
    interp = jax.default_backend() == "cpu"
    if phases is None:
        # Phase interleaving is a hardware-scheduling optimization; the
        # interpreter runs one phase (tests exercise 2 explicitly).
        phases = 1 if interp else PHASES
    # Pad the tile count to a phase multiple: the callers' lane quantum
    # stays LANES (pad_geometry), pad tiles run fully masked steps.
    t_pad = ((n_tiles + phases - 1) // phases) * phases
    h = t_pad // phases  # grid length; phase p owns tiles [p*h, (p+1)*h)
    kernel = _decode_kernel(params, k, delta, wn, phases=phases,
                            unroll=not interp)
    if t_pad != n_tiles:
        words_t = jnp.pad(words_t, ((0, 0), (0, (t_pad - n_tiles) * LANES)))
        lens = jnp.pad(
            lens.reshape(1, b), ((0, 0), (0, (t_pad - n_tiles) * LANES))
        )
    # Relayout the caller's 2-D lane order into the kernel's sublane-packed
    # (rows, G, LN) form: lane ell -> (tile, g, l) with
    # ell = tile*G*LN + g*LN + l.  One device copy each way (~HBM speed),
    # amortized over the whole kernel run.
    w3 = (
        words_t.reshape(wn, t_pad, G, LN)
        .transpose(0, 2, 1, 3)
        .reshape(wn, G, t_pad * LN)
    )
    l3 = (
        lens.reshape(t_pad, G, LN).transpose(1, 0, 2).reshape(G, t_pad * LN)
    )
    i3 = init_col.reshape(S_EXT, 1, 1)
    # Per-phase operands: contiguous tile halves of the minor dim (the
    # kernel takes separate refs per phase — no in-kernel lane slicing).
    lens_ops = [l3[:, p * h * LN : (p + 1) * h * LN] for p in range(phases)]
    words_ops = [w3[:, :, p * h * LN : (p + 1) * h * LN] for p in range(phases)]
    outs = pl.pallas_call(
        kernel,
        grid=(h,),
        in_specs=[
            pl.BlockSpec((S_EXT, 1, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ]
        + [
            pl.BlockSpec((G, LN), lambda i: (0, i), memory_space=pltpu.VMEM)
            for _ in range(phases)
        ]
        + [
            pl.BlockSpec((wn, G, LN), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
            for _ in range(phases)
        ],
        out_specs=[
            pl.BlockSpec((k_pad, G, LN), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
            for _ in range(phases)
        ],
        # Mosaic compiles on TPU; everywhere else (CPU tests, the 8-device
        # virtual mesh) the interpreter executes the identical semantics.
        interpret=interp,
        # words tiles + their prefetch double-buffers + the (K, G, LN) u8
        # outputs exceed the compiler's default scoped-vmem cap; v5e has
        # headroom above it.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((k_pad, G, h * LN), jnp.uint8)
            for _ in range(phases)
        ],
        scratch_shapes=[
            s
            for _ in range(phases)
            for s in (
                pltpu.VMEM((S_PAD, G, LN), i32),  # cdf
                pltpu.VMEM((C_PAD, G, LN), i32),  # coarse bucket row
                pltpu.VMEM((RING_SLABS * SLAB, G, LN), u32),  # stream ring
                pltpu.VMEM((EPOCH, G, LN), i32),  # symbol stage
                pltpu.VMEM((G, LN), i32),  # next-load slab index
                pltpu.SMEM((1, 1), i32),  # refill span lo
                pltpu.SMEM((1, 1), i32),  # refill span hi
            )
        ],
    )(i3, *lens_ops, *words_ops)
    out = outs[0] if phases == 1 else jnp.concatenate(outs, axis=2)
    return (
        out.reshape(k_pad, G, t_pad, LN)
        .transpose(0, 2, 1, 3)
        .reshape(k_pad, t_pad * LANES)[:, :b]
    )


def pad_geometry(wn: int, b: int):
    """(wn_pad, b_pad) for the kernel: >= 3 zero words past any stream
    (the decoder legitimately reads up to code_bits + pending_bound bits
    past the terminator), group-aligned for the refill sweep, lane-tile
    aligned."""
    grp = RING_SLABS * SLAB
    wn_pad = ((max(wn + 3, grp) + grp - 1) // grp) * grp
    b_pad = ((b + LANES - 1) // LANES) * LANES
    return wn_pad, b_pad


def init_cum_column(init_cum, params: Parameters):
    """(S_EXT, 1) int32 kernel model-init input.

    Rows ``[0, S_PAD)``: the dense cumulative row, freq_max padding.
    Rows ``[S_PAD, S_EXT)``: the coarse bucket-boundary row for the
    two-level sweep, ``C[j] = cdf[j*BS]``, freq_max padding — the pads
    receive every suffix update the live rows do (their row index always
    exceeds any symbol's bucket), so they stay >= every live entry and
    are never counted by a coarse sweep.
    """
    fine = np.pad(
        np.asarray(init_cum, dtype=np.int32),
        (0, S_PAD - int(np.asarray(init_cum).shape[0])),
        constant_values=np.int32(params.freq_max),
    )
    coarse = np.full(C_PAD, np.int32(params.freq_max), dtype=np.int32)
    coarse[:NB] = fine[0 : NB * BS : BS]
    return np.concatenate([fine, coarse]).reshape(S_EXT, 1)


def decode_blocks_pallas_t(
    words_t, lens_row, init_col, params: Parameters, k: int, delta: int = 1,
    phases: int | None = None,
):
    """Transposed-layout entry: zero device-side re-layouts.

    Args:
      words_t: ``(wn_pad, b_pad)`` uint32, lane-minor (see
        :func:`pad_geometry`; build on host to skip the device
        transpose — byte-granular relayouts are slow on TPU).
      lens_row: ``(1, b_pad)`` int32 symbol counts (0 for pad lanes).
      init_col: ``(S_EXT, 1)`` int32 from :func:`init_cum_column`.

    Returns ``(k_pad, b_pad)`` uint8 — symbol-position-major; callers
    slice/transpose on host.
    """
    if not (params.fits_u32 or params.fits_wide32):
        raise ValueError("pallas decoder requires fits_u32 or fits_wide32 params")
    with jax.enable_x64(False):
        return _decode_pallas_jit(
            words_t, lens_row, init_col, params, k, int(delta), phases,
            variant=_env_variant(),
        )


def decode_blocks_pallas(words, lens, init_cum, params: Parameters, k: int,
                         delta: int = 1, phases: int | None = None):
    """Drop-in for :func:`redux_tpu.ops.coder.decode_blocks` (v2 payloads).

    Args:
      words: ``(B, W)`` uint32 big-endian per-block streams, zero-padded
        past each stream's end (the v2 termination contract).
      lens: ``(B,)`` int32 symbol counts.
      init_cum: ``(symbol_count + 1,)`` initial cumulative row.
      params: must satisfy ``fits_u32`` or ``fits_wide32`` (both
        production TPU configs do).
      k: max symbols per block (static).

    Returns ``(B, k)`` uint8 decoded symbols.  Convenience form (device
    transposes); the api hot path uses :func:`decode_blocks_pallas_t`.
    """
    if not (params.fits_u32 or params.fits_wide32):
        raise ValueError("pallas decoder requires fits_u32 or fits_wide32 params")
    b, wn = words.shape
    wn_pad, b_pad = pad_geometry(wn, b)
    with jax.enable_x64(False):
        words = jnp.pad(words.astype(jnp.uint32), ((0, b_pad - b), (0, wn_pad - wn)))
        words_t = words.T  # (Wn, B): lanes on the 128-wide axis
        lens_p = jnp.pad(lens.astype(jnp.int32), (0, b_pad - b)).reshape(1, b_pad)
        init_col = jnp.asarray(init_cum_column(np.asarray(init_cum), params))
        out = _decode_pallas_jit(
            words_t, lens_p, init_col, params, k, int(delta), phases,
            variant=_env_variant(),
        )
        return out[:k, :b].T  # (B, k) uint8
