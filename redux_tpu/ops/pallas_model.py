"""Pallas TPU model-values kernel: the encode-side dense model sweep.

Round-4 discovery (BASELINE.md post-mortem): the XLA rank precompute —
the closed-form parallel derivation of every position's ``(lo, hi)``
model values — costs ~28 ms on the bench corpus, 7x the streaming coder
kernel it feeds, because its alphabet-wide masked-reduce formulation
re-touches ``positions x 256`` elements several times per quantity.

The DECODE kernel does the equivalent per-symbol work (a dense-row sweep
+ suffix update over the same ``(S_PAD, G, LN)`` VMEM-resident model) in
~6 ms for the same corpus.  Encode knows its symbols up front, so this
kernel is exactly that sweep minus everything decode must also do
(interval math, renormalization, stream reads):

* model state: one dense cumulative row per lane, ``(S_PAD, G, LN)``
  int32, identical layout/init to the decoder
  (:mod:`redux_tpu.ops.pallas_decode`);
* per symbol: ``b = row_index <= v`` (an IOTA compare — cheaper than
  decode's data compare), ``lo = cdf[v] = max(where(b, cdf, 0))``,
  ``hi = cdf[v+1] = min(where(b, BIG, cdf))`` (the row is strictly
  increasing), then the ``+delta`` suffix update unless frozen
  (adaptive_linear.rs:33-39) — chunked accumulators like the decoder's
  production sweep;
* the freeze gate and the running total are CLOSED FORMS of ``t``
  (ranks.py derivation), so the kernel carries no cross-epoch state
  beyond the model row itself;
* outputs stream straight to the ``(k_pad, B)`` transposed planes the
  streaming coder kernel consumes.

Bit-equivalence to :func:`redux_tpu.ops.ranks.precompute_encode_model`
is differential-tested (tests/test_pallas_model.py); the composition
with the coder is differential-tested against the sequential oracle.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import Parameters
from .pallas_decode import BS, C_PAD, NB, S_EXT, S_PAD, init_cum_column

LANES = int(_os.environ.get("REDUX_TPU_MLANES",
                            _os.environ.get("REDUX_TPU_LANES", "1024")))
if LANES <= 0 or LANES % 128:
    raise ValueError(
        f"REDUX_TPU_MLANES/REDUX_TPU_LANES must be a positive multiple of 128 "
        f"(got {LANES}); set before first import — later changes have no effect"
    )
LN = 128
G = max(1, LANES // LN)
EPOCH = 32

i32 = jnp.int32


def _model_kernel(params: Parameters, k: int, delta: int, n_epochs: int,
                  unroll: bool = True):
    # params/k/n_epochs parameterize the trace cache key; the freeze gate
    # and totals are closed forms of t (SMEM tfreeze), so the body needs
    # only `delta` and the shared geometry constants.

    # Sweep selection: "bucket" (two-level, fewest vector ops) on
    # hardware, "chunk" (the flat round-4 sweep) for A/B and as the
    # interpret-mode default.  Bit-identical outputs either way.
    sweep_mode = _os.environ.get(
        "REDUX_TPU_MODEL_SWEEP", "bucket" if unroll else "chunk"
    )

    def kernel(lens_ref, init_ref, consts_ref, syms_ref, lo_ref, hi_ref,
               cdf_s, coarse_s):
        e = pl.program_id(1)
        lens = lens_ref[:, :]
        tfreeze = consts_ref[0, 0]

        @pl.when(e == 0)
        def _init():
            cdf_s[:, :, :] = init_ref[0:S_PAD, :, :] + jnp.zeros(
                (S_PAD, G, LN), i32
            )
            if sweep_mode == "bucket":
                coarse_s[:, :, :] = init_ref[S_PAD:S_EXT, :, :] + jnp.zeros(
                    (C_PAD, G, LN), i32
                )

        CH = int(_os.environ.get("REDUX_TPU_MODEL_CH", "8"))
        assert S_PAD % CH == 0
        rows_ch = jax.lax.broadcasted_iota(i32, (CH, G, LN), 0)
        # Symbols per fused sweep: encode knows every symbol, so U
        # positions can share ONE row-update pass, with the later
        # positions' lo/hi fixed up by exact 1-compare corrections
        # against the group's earlier symbols (the +delta rule applied
        # symbolically).  Slope-timed NEGATIVE result: U=2/4 measure
        # 0.1/0.4 ms SLOWER than U=1 on v5e — the 4 extra (G, LN)
        # accumulators per extra symbol outweigh the shared store.
        # Default 1; kept as a differential-tested env experiment.
        U = int(_os.environ.get("REDUX_TPU_MODEL_GROUP", "1"))
        assert EPOCH % U == 0
        # Perturbation probes (dev-only): deliberately WRONG variants
        # that skip one stage so its share can be slope-timed on
        # hardware (same methodology as the decode kernel's probes).
        probe = _os.environ.get("REDUX_TPU_MODEL_PROBE", "")

        rows_c = jax.lax.broadcasted_iota(i32, (C_PAD, G, LN), 0)
        rows_b = jax.lax.broadcasted_iota(i32, (BS, G, LN), 0)

        def step_bucket(jj, _):
            """Two-level step: encode KNOWS the symbol, so its bucket is
            ``v >> 3`` for free (no coarse sweep at all) and lo/hi are
            one-hot reads of the selected bucket window — the coarse
            boundary row covers the ``v % BS == BS-1`` case where
            ``cdf[v+1]`` is the next bucket's first row.  One fused pass
            over the model rows does the window select (pre-update
            state — the position's values precede its own adaptation,
            adaptive_linear.rs:33-39) and the +delta suffix update."""
            t0 = e * EPOCH + jj
            v = syms_ref[pl.ds(jj, 1), :, :][0]
            upd = (t0 < lens) & (t0 < tfreeze)
            dv = jnp.where(upd, i32(delta), i32(0))
            jb = v >> i32(3)
            vl = v & i32(BS - 1)
            C = coarse_s[:, :, :]
            if probe != "noextract":
                cnext = jnp.sum(
                    jnp.where(rows_c == (jb + i32(1))[None], C, i32(0)),
                    axis=0, dtype=i32,
                )
            if probe != "noupdate":
                coarse_s[:, :, :] = C + jnp.where(
                    rows_c > jb[None], dv[None], i32(0)
                )
            # WSEL round-robin select chains + min-merge: breaks the
            # NB-long serial where-dependency (see pallas_decode bucket
            # sweep); exactly one chunk matches per lane, so unmatched
            # accumulators keep the sentinel.
            WSEL = int(_os.environ.get("REDUX_TPU_WSEL", "1"))
            if WSEL < 1:
                raise ValueError(f"REDUX_TPU_WSEL must be >= 1 (got {WSEL})")
            wacc = [jnp.full((BS, G, LN), 0x7FFFFFFF, i32)
                    for _ in range(WSEL)]
            for c in range(NB):
                ch = cdf_s[c * BS : (c + 1) * BS, :, :]
                if probe != "noextract":
                    s = c % WSEL
                    wacc[s] = jnp.where((jb == c)[None], ch, wacc[s])
                if probe != "noupdate":
                    m = rows_b > (v - i32(c * BS))[None]
                    cdf_s[c * BS : (c + 1) * BS, :, :] = ch + jnp.where(
                        m, dv[None], i32(0)
                    )
            w = wacc[0]
            for s in range(1, WSEL):
                w = jnp.minimum(w, wacc[s])
            if probe == "noextract":
                lo, hi = v, v + i32(1)  # probe-only garbage
            else:
                lo = jnp.sum(
                    jnp.where(rows_b == vl[None], w, i32(0)), axis=0, dtype=i32
                )
                hi_in = jnp.sum(
                    jnp.where(rows_b == (vl + i32(1))[None], w, i32(0)),
                    axis=0, dtype=i32,
                )
                hi = jnp.where(vl == i32(BS - 1), cnext, hi_in)
            lo_ref[pl.ds(jj, 1), :, :] = lo[None]
            hi_ref[pl.ds(jj, 1), :, :] = hi[None]
            return 0

        def step_bucket_pair(jj, _):
            """Two symbols per fused pass (bucket-mode U=2): one model-row
            load/store pass lands BOTH suffix updates and selects both
            windows; the second position's (lo, hi) are read from the
            PRE-pair state and fixed by exact lane-wise corrections
            (+dv1 when v2 [resp. v2+1] exceeds v1 — the +delta rule
            applied symbolically, adaptive_linear.rs:33-39).  When
            vl2 == BS-1 the boundary read C[jb2+1] gets the SAME
            correction, since then v2+1 == (jb2+1)*BS."""
            t0 = e * EPOCH + 2 * jj
            v1 = syms_ref[pl.ds(2 * jj, 1), :, :][0]
            v2 = syms_ref[pl.ds(2 * jj + 1, 1), :, :][0]
            dv1 = jnp.where((t0 < lens) & (t0 < tfreeze), i32(delta), i32(0))
            dv2 = jnp.where(
                ((t0 + 1) < lens) & ((t0 + 1) < tfreeze), i32(delta), i32(0)
            )
            jb1, vl1 = v1 >> i32(3), v1 & i32(BS - 1)
            jb2, vl2 = v2 >> i32(3), v2 & i32(BS - 1)
            C = coarse_s[:, :, :]
            if probe != "noextract":
                cn1 = jnp.sum(
                    jnp.where(rows_c == (jb1 + i32(1))[None], C, i32(0)),
                    axis=0, dtype=i32,
                )
                cn2 = jnp.sum(
                    jnp.where(rows_c == (jb2 + i32(1))[None], C, i32(0)),
                    axis=0, dtype=i32,
                )
            if probe != "noupdate":
                coarse_s[:, :, :] = (
                    C
                    + jnp.where(rows_c > jb1[None], dv1[None], i32(0))
                    + jnp.where(rows_c > jb2[None], dv2[None], i32(0))
                )
            w1 = jnp.zeros((BS, G, LN), i32)
            w2 = jnp.zeros((BS, G, LN), i32)
            for c in range(NB):
                ch = cdf_s[c * BS : (c + 1) * BS, :, :]
                if probe != "noextract":
                    w1 = jnp.where((jb1 == c)[None], ch, w1)
                    w2 = jnp.where((jb2 == c)[None], ch, w2)
                if probe != "noupdate":
                    m1 = rows_b > (v1 - i32(c * BS))[None]
                    m2 = rows_b > (v2 - i32(c * BS))[None]
                    cdf_s[c * BS : (c + 1) * BS, :, :] = (
                        ch
                        + jnp.where(m1, dv1[None], i32(0))
                        + jnp.where(m2, dv2[None], i32(0))
                    )

            def tap(w, vl):
                return jnp.sum(
                    jnp.where(rows_b == vl[None], w, i32(0)), axis=0, dtype=i32
                )

            if probe == "noextract":
                lo1, hi1 = v1, v1 + i32(1)  # probe-only garbage
                lo2, hi2 = v2, v2 + i32(1)
            else:
                lo1 = tap(w1, vl1)
                hi1 = jnp.where(vl1 == i32(BS - 1), cn1, tap(w1, vl1 + i32(1)))
                lo2 = tap(w2, vl2) + dv1 * (v2 > v1).astype(i32)
                hi2 = jnp.where(
                    vl2 == i32(BS - 1), cn2, tap(w2, vl2 + i32(1))
                ) + dv1 * (v2 + i32(1) > v1).astype(i32)
            lo_ref[pl.ds(2 * jj, 1), :, :] = lo1[None]
            hi_ref[pl.ds(2 * jj, 1), :, :] = hi1[None]
            lo_ref[pl.ds(2 * jj + 1, 1), :, :] = lo2[None]
            hi_ref[pl.ds(2 * jj + 1, 1), :, :] = hi2[None]
            return 0

        def step(jj, _):
            t0 = e * EPOCH + jj * U
            vs, dv = [], []
            for u in range(U):
                vs.append(syms_ref[pl.ds(jj * U + u, 1), :, :][0])
                # Freeze once the running total reaches freq_max: with
                # the closed-form total init + delta*min(t, lens,
                # tfreeze), the gate is t < tfreeze for active lanes
                # (ranks.py derivation).
                upd = ((t0 + u) < lens) & ((t0 + u) < tfreeze)
                dv.append(jnp.where(upd, i32(delta), i32(0)))
            acc_lo = [jnp.zeros((G, LN), i32) for _ in range(U)]
            acc_hi = [jnp.full((G, LN), 0x7FFFFFFF, i32) for _ in range(U)]
            for c in range(S_PAD // CH):
                ch = cdf_s[c * CH : (c + 1) * CH, :, :]
                upd_sum = None
                for u in range(U):
                    bch = (rows_ch + i32(c * CH)) <= vs[u][None]
                    if probe != "noextract":
                        acc_lo[u] = jnp.maximum(
                            acc_lo[u],
                            jnp.max(jnp.where(bch, ch, i32(0)), axis=0),
                        )
                        acc_hi[u] = jnp.minimum(
                            acc_hi[u],
                            jnp.min(jnp.where(bch, i32(0x7FFFFFFF), ch), axis=0),
                        )
                    inc = jnp.where(bch, i32(0), dv[u][None])
                    upd_sum = inc if upd_sum is None else upd_sum + inc
                if probe != "noupdate":
                    cdf_s[c * CH : (c + 1) * CH, :, :] = ch + upd_sum
            # Corrections: position u's values are against the row state
            # AFTER the group's earlier updates; extraction above read
            # the group-start state, so add delta_i for each earlier
            # symbol below (lo) / at-or-below (hi) this one
            # (adaptive_linear.rs:33-39 applied symbolically).
            for u in range(1, U):
                for i in range(u):
                    gt = (vs[u] > vs[i]).astype(i32)
                    ge = (vs[u] >= vs[i]).astype(i32)
                    acc_lo[u] = acc_lo[u] + dv[i] * gt
                    acc_hi[u] = acc_hi[u] + dv[i] * ge
            for u in range(U):
                lo_ref[pl.ds(jj * U + u, 1), :, :] = acc_lo[u][None]
                hi_ref[pl.ds(jj * U + u, 1), :, :] = acc_hi[u][None]
            return 0

        if sweep_mode == "bucket" and U <= 2:
            # Bucket mode honors U in {1, 2}: the paired step shares one
            # model-row load/store pass between two symbols.  U > 2 falls
            # back to the chunk sweep below, which supports any U — the
            # knob keeps working regardless of the sweep default.
            body = step_bucket_pair if U == 2 else step_bucket
            n_steps = EPOCH // U
        else:
            body = step
            n_steps = EPOCH // U
        if unroll:
            for jj in range(n_steps):
                body(jj, 0)
        else:
            jax.lax.fori_loop(0, n_steps, body, 0)

    return kernel


def _env_variant() -> str:
    """Env knobs the model-kernel trace reads, passed as a static jit
    arg so toggling them after a first compile re-traces instead of
    hitting a stale cache (see pallas_decode._env_variant)."""
    keys = ("REDUX_TPU_MODEL_SWEEP", "REDUX_TPU_MODEL_CH",
            "REDUX_TPU_MODEL_GROUP", "REDUX_TPU_WSEL",
            "REDUX_TPU_MODEL_PROBE")
    return "|".join(_os.environ.get(k, "") for k in keys)


@functools.partial(
    jax.jit, static_argnames=("params", "k", "delta", "variant")
)
def _model_lohi_jit(syms_t, lens, init_col, consts, params: Parameters,
                    k: int, delta: int, variant: str = ""):
    """(k_pad, b) int32 lo/hi planes from (k_pad, b) int32 symbols.

    ``syms_t`` is position-major (the coder kernel's plane layout);
    ``lens`` is (1, b); ``consts`` is (1, 1) int32 [t_freeze].
    """
    k_pad, b = syms_t.shape
    n_tiles = b // LANES
    n_epochs = k_pad // EPOCH
    interp = jax.default_backend() == "cpu"
    kernel = _model_kernel(params, k, delta, n_epochs, unroll=not interp)
    s3 = (
        syms_t.reshape(k_pad, n_tiles, G, LN)
        .transpose(0, 2, 1, 3)
        .reshape(k_pad, G, n_tiles * LN)
    )
    l3 = lens.reshape(n_tiles, G, LN).transpose(1, 0, 2).reshape(G, n_tiles * LN)
    i3 = init_col.reshape(S_EXT, 1, 1)
    lo, hi = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_epochs),
        in_specs=[
            pl.BlockSpec((G, LN), lambda i, e: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((S_EXT, 1, 1), lambda i, e: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, e: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((EPOCH, G, LN), lambda i, e: (e, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((EPOCH, G, LN), lambda i, e: (e, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EPOCH, G, LN), lambda i, e: (e, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interp,
        out_shape=(
            jax.ShapeDtypeStruct((k_pad, G, n_tiles * LN), i32),
            jax.ShapeDtypeStruct((k_pad, G, n_tiles * LN), i32),
        ),
        scratch_shapes=[
            pltpu.VMEM((S_PAD, G, LN), i32),  # cdf
            pltpu.VMEM((C_PAD, G, LN), i32),  # coarse bucket row
        ],
    )(l3, i3, consts, s3)

    def back(x):
        return (
            x.reshape(k_pad, G, n_tiles, LN)
            .transpose(0, 2, 1, 3)
            .reshape(k_pad, b)
        )

    return back(lo), back(hi)


def model_lohi_pallas(syms, lens, init_cum, params: Parameters, delta: int = 1):
    """(lo, hi) model-value planes for ``(B, K)`` symbols — kernel entry.

    Drop-in for the first two outputs of
    :func:`redux_tpu.ops.ranks.precompute_encode_model` (``with_tot``
    analog: totals are closed-form, computed by the coder in-kernel).
    Convenience form with device transposes; the fused encode path feeds
    the transposed layout directly.
    """
    b, k = syms.shape
    b_pad = ((b + LANES - 1) // LANES) * LANES
    k_pad = ((k + EPOCH - 1) // EPOCH) * EPOCH
    with jax.enable_x64(False):
        syms_t = jnp.pad(
            syms.astype(jnp.int32), ((0, b_pad - b), (0, k_pad - k))
        ).T
        lens_p = jnp.pad(lens.astype(jnp.int32), (0, b_pad - b)).reshape(1, b_pad)
        init_col = jnp.asarray(init_cum_column(np.asarray(init_cum), params))
        it0 = jnp.asarray(init_cum, jnp.int32)[-1]
        tf = jnp.maximum(
            (jnp.int32(params.freq_max) - it0 + (delta - 1)) // jnp.int32(delta),
            0,
        ).reshape(1, 1)
        lo, hi = _model_lohi_jit(
            syms_t, lens_p, init_col, tf, params, k, int(delta),
            variant=_env_variant(),
        )
        return lo.T[:b, :k], hi.T[:b, :k]
