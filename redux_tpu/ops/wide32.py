"""Exact 42-bit integer multiply/divide built from u32 + f32 TPU ops.

The production config ``Parameters.tpu_wide()`` (8, 20, 22) needs the
coder's ``range * freq // count`` arithmetic (codec.rs:58-60, 129-131)
exact over products up to ``2**42`` — wider than the TPU's native u32
integer units, but far short of needing XLA's slow emulated 64-bit path.
This module implements the two primitives the kernels need:

* :func:`mul_split` — ``a * b`` for ``a < 2**22``, ``b < 2**20`` as a
  non-canonical limb pair ``(hi, lo)`` with value ``hi * 2**11 + lo``;
  both limbs fit u32 exactly (``(a >> 11) * b <= 2**31``,
  ``(a & 2047) * b <= 2**31``).
* :func:`div_fix` — exact floor division of such a pair by
  ``d < 2**22`` with quotient ``< 2**23``.  A float32 estimate
  (relative error ``<= ~4 * 2**-24`` from rounding the limbs, the sum
  and the division) lands within a few units of the true quotient; the
  exact signed remainder is then recovered **in wraparound u32
  arithmetic**: both ``x mod 2**32`` and ``q * d mod 2**32`` are
  computable, and the true signed remainder after a small-error
  quotient is well inside int32 range, so interpreting the 32-bit
  difference as int32 is exact.  One int32 floor division of that
  small remainder by ``d`` yields the exact correction in a single
  step (no iteration, no error-bound case analysis).

Everything here is plain jnp on u32/f32/int32 — legal both in traced
XLA code and inside Pallas TPU kernels.  Ground-truth differential
tests: tests/test_wide32.py.
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32
_LIMB = 11  # limb shift: hi * 2**11 + lo
# Plain Python ints (not jnp scalars): they must inline as immediates so
# these helpers stay legal inside Pallas kernels (captured device-array
# constants are rejected by pallas_call).
_LIMB_MASK = (1 << _LIMB) - 1

# Operand bounds for which the limb pair is exact (asserted by callers'
# Parameters validation, see Parameters.fits_wide32).
MAX_A_BITS = 22  # a < 2**22  (code range)
MAX_B_BITS = 20  # b < 2**20  (frequency / count)
MAX_Q_BITS = 23  # quotients < 2**23


def mul_split(a, b):
    """``(hi, lo)`` u32 pair with ``a * b == hi * 2**11 + lo`` exactly.

    Requires ``a < 2**22`` and ``b < 2**21`` (so both partial products
    stay below ``2**32``).  Inputs may be any integer dtype; they are
    cast to u32.
    """
    a = a.astype(_U32)
    b = b.astype(_U32)
    hi = (a >> _LIMB) * b
    lo = (a & _LIMB_MASK) * b
    return hi, lo


def pair_sub1(hi, lo):
    """Subtract 1 from a limb pair representing a value ``>= 1``."""
    borrow = lo == 0
    lo = jnp.where(borrow, _LIMB_MASK, lo - 1)
    hi = jnp.where(borrow, hi - 1, hi)
    return hi, lo


def pair_mod32(hi, lo):
    """``(hi * 2**11 + lo) mod 2**32`` (wraparound u32)."""
    return (hi << _LIMB) + lo


def div_fix(hi, lo, d):
    """Exact ``(hi * 2**11 + lo) // d`` for ``d >= 1``, quotient ``< 2**23``.

    f32 estimate + int32-exact remainder fixup (see module docstring).
    """
    d = d.astype(_U32)
    # All magnitudes here are < 2**31, so u32 -> i32 -> f32 is exact and
    # avoids the u32 -> f32 cast Mosaic does not implement.
    df = d.astype(jnp.int32).astype(jnp.float32)
    xf = (
        hi.astype(jnp.int32).astype(jnp.float32) * jnp.float32(1 << _LIMB)
        + lo.astype(jnp.int32).astype(jnp.float32)
    )
    q = jnp.floor(xf / df).astype(jnp.int32).astype(_U32)
    x32 = pair_mod32(hi, lo)
    di = d.astype(jnp.int32)
    r = (x32 - q * d).astype(jnp.int32)  # exact signed remainder (|r| small)
    # Exact correction in one shot: floor(r / d) is the signed number of
    # divisor multiples the estimate is off by (jnp // on int32 floors).
    return q + (r // di).astype(_U32)


def muldiv(a, b, d):
    """Exact ``a * b // d`` under the module's operand bounds."""
    hi, lo = mul_split(a, b)
    return div_fix(hi, lo, d)


# ---------------------------------------------------------------------------
# Reciprocal-shared variants.
#
# Divides (f32 and i32 alike) are long-latency ops on the VPU's special
# unit and the coder's hot loops issue several per symbol with the SAME
# divisor (count divides both interval bounds; the round-4 probe
# attribution put the decode step's serial chain at ~55% of kernel time,
# dominated by these divides).  The variants below take a precomputed
# f32 reciprocal — ONE divide per divisor per step — and replace the
# exact i32-division fixup with a bounded compare ladder:
#
#   q_est = floor(xf * (1/d))   with relative error <= ~5 * 2**-24
#   (xf: <= 3 roundings; 1/d: 1; product: 1), so for quotients < 2**23
#   the absolute error is <= 2.5, and the true correction
#   floor((x - q_est*d)/d) = q_true - q_est lies in [-3, 3].  A +/-4
#   compare ladder (pipelined ALU ops, no divide) recovers it exactly.
# ---------------------------------------------------------------------------


def rcp_f32(d):
    """``fl(1 / d)`` for integer ``1 <= d < 2**24`` — the one divide,
    shared across every :func:`div_fix_rcp` with the same divisor."""
    return jnp.float32(1.0) / d.astype(jnp.int32).astype(jnp.float32)


def div_fix_rcp(hi, lo, d, dr):
    """Exact ``(hi * 2**11 + lo) // d`` given ``dr = rcp_f32(d)``.

    Same contract as :func:`div_fix` (d >= 1, quotient < 2**23) with no
    division ops at all — mults plus the +/-4 correction ladder.
    """
    d = d.astype(_U32)
    i32 = jnp.int32
    xf = (
        hi.astype(i32).astype(jnp.float32) * jnp.float32(1 << _LIMB)
        + lo.astype(i32).astype(jnp.float32)
    )
    q = jnp.floor(xf * dr).astype(i32).astype(_U32)
    x32 = pair_mod32(hi, lo)
    di = d.astype(i32)
    r = (x32 - q * d).astype(i32)  # exact signed remainder (|r| < 5d)
    d2 = di + di
    d3 = d2 + di
    d4 = d3 + di
    c = (
        (r >= di).astype(i32)
        + (r >= d2).astype(i32)
        + (r >= d3).astype(i32)
        + (r >= d4).astype(i32)
        - (r < 0).astype(i32)
        - (r < -di).astype(i32)
        - (r < -d2).astype(i32)
        - (r < -d3).astype(i32)
    )
    return q + c.astype(_U32)


def muldiv_rcp(a, b, d, dr):
    """Exact ``a * b // d`` with a precomputed ``dr = rcp_f32(d)``."""
    hi, lo = mul_split(a, b)
    return div_fix_rcp(hi, lo, d, dr)


def muldiv_sub1_rcp(a, b, d, dr):
    """Exact ``(a * b - 1) // d`` with ``dr = rcp_f32(d)`` (``a*b >= 1``)."""
    hi, lo = mul_split(a, b)
    hi, lo = pair_sub1(hi, lo)
    return div_fix_rcp(hi, lo, d, dr)


def muldiv_sub1(a, b, d):
    """Exact ``(a * b - 1) // d`` (the decoder's value formula, codec.rs:131).

    Requires ``a * b >= 1``.
    """
    hi, lo = mul_split(a, b)
    hi, lo = pair_sub1(hi, lo)
    return div_fix(hi, lo, d)
