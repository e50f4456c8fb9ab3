"""Vectorized Witten–Neal–Cleary interval coder.

The reference coder (``/root/reference/src/codec.rs``) is a bit-serial
state machine.  Here the SAME state machine — identical interval
narrowing (codec.rs:58-60,133-135), E1/E2/E3 renormalization
(codec.rs:62-89,141-158), pending-bit emission (codec.rs:39-46), EOF
extra-bit drain (codec.rs:91-99) and zero-padded flush — runs over a
*batch axis of independent blocks*: every jnp op below is shaped
``(B, ...)`` where ``B`` is thousands of blocks, so the sequential scan is
over symbol positions only while the VPU lanes carry the blocks.  The
bitstream produced for each block is bit-identical to what the reference
would produce for that block's bytes (verified differentially against
:mod:`redux_tpu.oracle`).

Encode consumes the precomputed per-position model triples from
:mod:`redux_tpu.ops.ranks` — the encoder never touches a model table.
Decode cannot precompute (symbols are unknown), so it carries one dense
cumulative row per block and does rank-select + masked suffix add per step
(the :class:`~redux_tpu.models.dense.DenseModel` formulation).

Integer width policy (see ``Parameters.fits_u32``): all interval math runs
in ``uint32`` when ``code_bits + freq_bits <= 32`` (native TPU ints) and in
``int64`` otherwise (products bounded by ``2**(code+freq) <= 2**62`` for
``code_bits <= 32``, exact in XLA's emulated 64-bit).  The vectorized path
requires ``code_bits <= 32``; wider configs use the sequential oracle.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from ..params import Parameters


def coder_dtype(params: Parameters):
    """Working dtype for interval arithmetic (uint32 fast path or int64)."""
    if params.code_bits > 32 or params.code_bits + params.freq_bits > 62:
        raise ValueError(
            "vectorized coder supports code_bits <= 32 and code+freq <= 62; "
            "use the sequential oracle for wider configs"
        )
    return jnp.uint32 if params.fits_u32 else jnp.int64


def max_block_words(max_count: int, n_symbols: int, params: Parameters, k: int) -> int:
    """Upper bound (in u32 words) on one block's compressed size.

    Every symbol's code length is at most ``ceil(log2(count/freq)) + 2``
    bits with ``freq >= 1`` and ``count <= max_count``; add the EOF symbol,
    the ``code_bits`` disambiguation drain (codec.rs:91-99) and byte
    padding.  Checked at runtime by the caller (overflow is detected, never
    silent).
    """
    bps = max(1, math.ceil(math.log2(max(2, max_count)))) + 2
    total_bits = (k + 1) * bps + params.code_bits + 8
    return total_bits // 32 + 2


def _flush_full(buf, nword, acc, accbits, rows, n_words, wdt):
    """Flush a full 32-bit word from lanes whose accumulator just filled."""
    full = accbits == 32
    idx = jnp.minimum(nword, n_words - 1)
    cur = buf[rows, idx]
    word = acc.astype(jnp.uint32)
    buf = buf.at[rows, idx].set(jnp.where(full, word, cur))
    nword = nword + full.astype(jnp.int32)
    acc = jnp.where(full, jnp.zeros_like(acc), acc)
    accbits = jnp.where(full, 0, accbits)
    return buf, nword, acc, accbits


def _emit_run(buf, nword, acc, accbits, bit, n, mask, rows, n_words, wdt):
    """Append ``n`` copies of ``bit`` to masked lanes' bit accumulators.

    Equivalent to ``n`` reference ``write_bits(bit, 1)`` calls
    (bitio/mod.rs:148-181) per lane; maintains the invariant
    ``acc < 2**accbits``, ``accbits < 32`` between calls.
    """
    n = jnp.where(mask, n, 0).astype(jnp.int32)
    one = jnp.asarray(1, wdt)

    def cond(c):
        return jnp.any(c[4] > 0)

    def body(c):
        buf, nword, acc, accbits, n = c
        m = jnp.minimum(n, 32 - accbits)  # per-lane chunk, 0 when done
        msh = m.astype(wdt)
        chunk = jnp.where(bit > 0, (one << msh) - one, jnp.zeros_like(acc))
        acc = (acc << msh) | chunk
        accbits = accbits + m
        n = n - m
        buf, nword, acc, accbits = _flush_full(
            buf, nword, acc, accbits, rows, n_words, wdt
        )
        return (buf, nword, acc, accbits, n)

    buf, nword, acc, accbits, _ = jax.lax.while_loop(
        cond, body, (buf, nword, acc, accbits, n)
    )
    return buf, nword, acc, accbits


def _put_bit(buf, nword, acc, accbits, pending, bit, mask, rows, n_words, wdt):
    """Reference ``put_bit``: one ``bit`` then ``pending`` opposite bits
    (codec.rs:39-46), for masked lanes."""
    buf, nword, acc, accbits = _emit_run(
        buf, nword, acc, accbits, bit, jnp.ones_like(pending), mask, rows, n_words, wdt
    )
    opp = jnp.asarray(1, wdt) - bit
    buf, nword, acc, accbits = _emit_run(
        buf, nword, acc, accbits, opp, pending, mask, rows, n_words, wdt
    )
    pending = jnp.where(mask, 0, pending)
    return buf, nword, acc, accbits, pending


@functools.partial(jax.jit, static_argnames=("params", "n_words"))
def encode_blocks(lo, hi, tot, eof_lo, eof_hi, eof_tot, lens, params: Parameters, n_words: int):
    """Encode ``B`` blocks in parallel from precomputed model triples.

    Args:
      lo, hi, tot: ``(B, K)`` int32 per-position model values
        (from :func:`~redux_tpu.ops.ranks.precompute_encode_model`).
      eof_lo, eof_hi, eof_tot: ``(B,)`` int32 EOF-symbol triples.
      lens: ``(B,)`` int32 symbol count per block (``<= K``).
      n_words: output buffer width per block, in u32 words.

    Returns:
      ``(words, byte_lens)``: ``(B, n_words)`` uint32 big-endian bit
      buffers and ``(B,)`` int32 compressed byte counts.  Each lane's
      first ``byte_lens[b]`` bytes are a complete reference-format stream
      for that block (EOF symbol + extra bits + zero padding included,
      codec.rs:91-99).
    """
    B, K = lo.shape
    wdt = coder_dtype(params)
    half = jnp.asarray(params.code_half, wdt)
    q1 = jnp.asarray(params.code_one_fourth, wdt)
    q3 = jnp.asarray(params.code_three_fourths, wdt)
    cmax = jnp.asarray(params.code_max, wdt)
    one = jnp.asarray(1, wdt)
    zero = jnp.asarray(0, wdt)
    rows = jnp.arange(B)

    def scan_step(carry, t):
        low, high, pending, extra, acc, accbits, nword, buf, bytelens, done = carry
        is_eof = (t == lens) & ~done
        active = (t <= lens) & ~done
        tmin = jnp.minimum(t, K - 1)
        lo_t = jax.lax.dynamic_index_in_dim(lo, tmin, axis=1, keepdims=False)
        hi_t = jax.lax.dynamic_index_in_dim(hi, tmin, axis=1, keepdims=False)
        tot_t = jax.lax.dynamic_index_in_dim(tot, tmin, axis=1, keepdims=False)
        flo = jnp.where(is_eof, eof_lo, lo_t).astype(wdt)
        fhi = jnp.where(is_eof, eof_hi, hi_t).astype(wdt)
        count = jnp.where(is_eof, eof_tot, tot_t).astype(wdt)

        # Interval narrowing (codec.rs:58-60).
        rng = high - low + one
        nhigh = low + (rng * fhi) // count - one
        nlow = low + (rng * flo) // count
        low = jnp.where(active, nlow, low)
        high = jnp.where(active, nhigh, high)

        # E1/E2/E3 renormalization (codec.rs:62-89).
        def rcond(c):
            low, high = c[0], c[1]
            c1 = high < half
            c2 = low >= half
            c3 = (~c1) & (~c2) & (low >= q1) & (high < q3)
            return jnp.any(active & (c1 | c2 | c3))

        def rbody(c):
            low, high, pending, extra, acc, accbits, nword, buf = c
            c1 = high < half
            c2 = low >= half
            c3 = (~c1) & (~c2) & (low >= q1) & (high < q3)
            go = active & (c1 | c2 | c3)
            emit = go & (c1 | c2)
            bit = jnp.where(c2, one, zero)
            buf, nword, acc, accbits, pending = _put_bit(
                buf, nword, acc, accbits, pending, bit, emit, rows, n_words, wdt
            )
            e3 = go & c3
            pending = pending + e3.astype(jnp.int32)
            low = jnp.where(e3, low - q1, low)
            high = jnp.where(e3, high - q1, high)
            extra = extra - (go & is_eof).astype(jnp.int32)
            low = jnp.where(go, (low << one) & cmax, low)
            high = jnp.where(go, ((high << one) | one) & cmax, high)
            return (low, high, pending, extra, acc, accbits, nword, buf)

        low, high, pending, extra, acc, accbits, nword, buf = jax.lax.while_loop(
            rcond, rbody, (low, high, pending, extra, acc, accbits, nword, buf)
        )

        # EOF epilogue: drain `extra` disambiguation bits from low
        # (codec.rs:91-99), then flush to a byte boundary.
        def dcond(c):
            extra = c[2]
            return jnp.any(is_eof & (extra > 0))

        def dbody(c):
            low, pending, extra, acc, accbits, nword, buf = c
            m = is_eof & (extra > 0)
            bit = jnp.where((low & half) != zero, one, zero)
            buf, nword, acc, accbits, pending = _put_bit(
                buf, nword, acc, accbits, pending, bit, m, rows, n_words, wdt
            )
            low = jnp.where(m, (low << one) & cmax, low)
            extra = extra - m.astype(jnp.int32)
            return (low, pending, extra, acc, accbits, nword, buf)

        low, pending, extra, acc, accbits, nword, buf = jax.lax.while_loop(
            dcond, dbody, (low, pending, extra, acc, accbits, nword, buf)
        )

        # flush_bits: pad the partial byte with zeros (bitio/mod.rs:183-198)
        # and left-justify the tail word for big-endian byte extraction.
        padn = ((8 - (accbits % 8)) % 8).astype(jnp.int32)
        acc = jnp.where(is_eof, acc << padn.astype(wdt), acc)
        accbits = jnp.where(is_eof, accbits + padn, accbits)
        new_bytelen = (nword * 32 + accbits) // 8
        wmask = is_eof & (accbits > 0)
        idx = jnp.minimum(nword, n_words - 1)
        tail = (acc << (32 - accbits).astype(wdt)).astype(jnp.uint32)
        cur = buf[rows, idx]
        buf = buf.at[rows, idx].set(jnp.where(wmask, tail, cur))
        bytelens = jnp.where(is_eof, new_bytelen, bytelens)
        acc = jnp.where(is_eof, zero, acc)
        accbits = jnp.where(is_eof, 0, accbits)
        done = done | is_eof

        return (low, high, pending, extra, acc, accbits, nword, buf, bytelens, done), None

    init = (
        jnp.full((B,), params.code_min, wdt),  # low  (codec.rs:30)
        jnp.full((B,), params.code_max, wdt),  # high (codec.rs:31)
        jnp.zeros((B,), jnp.int32),  # pending
        jnp.full((B,), params.code_bits, jnp.int32),  # extra (codec.rs:33)
        jnp.zeros((B,), wdt),  # acc
        jnp.zeros((B,), jnp.int32),  # accbits
        jnp.zeros((B,), jnp.int32),  # nword
        jnp.zeros((B, n_words), jnp.uint32),  # buf
        jnp.zeros((B,), jnp.int32),  # bytelens
        jnp.zeros((B,), bool),  # done
    )
    ts = jnp.arange(K + 1, dtype=jnp.int32)
    carry, _ = jax.lax.scan(scan_step, init, ts)
    buf, bytelens = carry[7], carry[8]
    return buf, bytelens


@functools.partial(jax.jit, static_argnames=("params", "k"))
def decode_blocks(words, lens, init_cum, params: Parameters, k: int):
    """Decode ``B`` blocks in parallel; each lane runs the reference decoder.

    Args:
      words: ``(B, W)`` uint32 big-endian per-block bitstreams.
      lens: ``(B,)`` int32 symbol counts (stored-length termination: the
        trailing EOF symbol in each stream is never decoded).
      init_cum: ``(symbol_count + 1,)`` int32 initial cumulative row
        (uniform or warm-start prior — must match the encoder's).
      k: max symbols per block (static).

    Returns:
      ``(B, k)`` int32 decoded symbols (entries past ``lens`` are 0).
    """
    B, W = words.shape
    S = params.symbol_count
    wdt = coder_dtype(params)
    half = jnp.asarray(params.code_half, wdt)
    q1 = jnp.asarray(params.code_one_fourth, wdt)
    q3 = jnp.asarray(params.code_three_fourths, wdt)
    one = jnp.asarray(1, wdt)
    zero = jnp.asarray(0, wdt)
    freq_max = params.freq_max
    rows = jnp.arange(B)
    iota = jnp.arange(S + 1, dtype=jnp.int32)

    def read_bit(bitpos):
        idx = jnp.minimum(bitpos >> 5, W - 1)
        off = (bitpos & 31).astype(jnp.uint32)
        w = words[rows, idx]
        return ((w >> (31 - off)) & 1).astype(wdt)

    # Prime code_bits bits into the code value (codec.rs:124-127).
    cb = params.code_bits
    w0 = words[:, 0]
    if cb <= 32:
        if wdt == jnp.uint32:
            pending0 = (w0 >> (32 - cb)).astype(wdt) if cb < 32 else w0.astype(wdt)
        else:
            pending0 = (w0.astype(jnp.int64) >> (32 - cb)) if cb < 32 else w0.astype(jnp.int64)
    else:  # pragma: no cover - excluded by coder_dtype
        raise ValueError("code_bits > 32 unsupported")

    def scan_step(carry, t):
        low, high, pending, bitpos, cdf = carry
        active = t < lens

        rng = high - low + one
        count = cdf[:, S].astype(wdt)
        value = ((pending - low + one) * count - one) // rng  # codec.rs:131
        v32 = jnp.clip(value, 0, jnp.asarray(2**31 - 1, wdt)).astype(jnp.int32)
        # Rank-select on the dense cumulative row: first i with value < cdf[i+1].
        sym = jnp.sum((cdf[:, 1:] <= v32[:, None]).astype(jnp.int32), axis=1)
        sym = jnp.minimum(sym, S - 1)
        flo = jnp.take_along_axis(cdf, sym[:, None], axis=1)[:, 0].astype(wdt)
        fhi = jnp.take_along_axis(cdf, sym[:, None] + 1, axis=1)[:, 0].astype(wdt)

        # Adapt: +1 above the symbol unless frozen (adaptive_linear.rs:33-39).
        upd = active & (cdf[:, S] < freq_max)
        cdf = cdf + ((iota[None, :] > sym[:, None]) & upd[:, None]).astype(jnp.int32)

        nhigh = low + (rng * fhi) // count - one
        nlow = low + (rng * flo) // count
        low = jnp.where(active, nlow, low)
        high = jnp.where(active, nhigh, high)

        # Decoder renormalization (codec.rs:141-158): mirror of the encoder,
        # consuming one bit per iteration; no code_max masking (the E2/E3
        # subtraction keeps values in range before the shift).
        def rcond(c):
            low, high = c[0], c[1]
            c1 = high < half
            c2 = low >= half
            c3 = (~c1) & (~c2) & (low >= q1) & (high < q3)
            return jnp.any(active & (c1 | c2 | c3))

        def rbody(c):
            low, high, pending, bitpos = c
            c1 = high < half
            c2 = low >= half
            c3 = (~c1) & (~c2) & (low >= q1) & (high < q3)
            go = active & (c1 | c2 | c3)
            sub = jnp.where(c2, half, jnp.where(c3, q1, zero))
            sub = jnp.where(go, sub, zero)
            pending = pending - sub
            low = low - sub
            high = high - sub
            bit = read_bit(bitpos)
            low = jnp.where(go, low << one, low)
            high = jnp.where(go, (high << one) | one, high)
            pending = jnp.where(go, (pending << one) | bit, pending)
            bitpos = bitpos + go.astype(jnp.int32)
            return (low, high, pending, bitpos)

        low, high, pending, bitpos = jax.lax.while_loop(
            rcond, rbody, (low, high, pending, bitpos)
        )
        out = jnp.where(active, sym, 0)
        return (low, high, pending, bitpos, cdf), out

    init = (
        jnp.full((B,), params.code_min, wdt),
        jnp.full((B,), params.code_max, wdt),
        pending0,
        jnp.full((B,), cb, jnp.int32),
        jnp.broadcast_to(init_cum.astype(jnp.int32), (B, S + 1)),
    )
    ts = jnp.arange(k, dtype=jnp.int32)
    _, syms = jax.lax.scan(scan_step, init, ts)
    return syms.T  # (B, k)


# Backwards-compatible alias used by high-level code.
CoderConfig = Parameters
