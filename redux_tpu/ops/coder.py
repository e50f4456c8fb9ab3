"""Vectorized Witten–Neal–Cleary interval coder with closed-form renorm.

The reference coder (``/root/reference/src/codec.rs``) renormalizes one bit
at a time: E1/E2 emit/consume a bit while the interval sits in one half,
E3 handles the middle-straddle underflow (codec.rs:62-89,141-158).  A
bit-serial loop is the worst possible shape for TPU, so this module
re-derives the SAME state machine in closed form, processing each symbol's
entire renormalization with a handful of wide vector ops and **no per-bit
loops**:

* E1/E2 run length ``n1`` = number of common leading bits of ``low`` and
  ``high`` (tops equal ⇔ exactly the E1/E2 conditions) = ``clz(low ^ high)``
  in code_bits width.  The emitted bits are the top ``n1`` bits of ``low``,
  with the reference's pending-bit flush after the first emitted bit
  (codec.rs:39-46).
* E3 run length ``n3`` = min(leading 1s of ``low`` after its top 0,
  leading 0s of ``high`` after its top 1) — each E3 step removes the
  second bit of both bounds (codec.rs:75-82).  ``pending += n3``.
* Interval updates collapse to shift/mask forms:
  ``low ← ((low << n1) & mask) << n3  & (mask >> 1)`` (with the top bit
  pattern preserved), etc. — verified bit-exact against the per-bit oracle.
* The decoder tracks ``z = pending - low`` (the offset of the code value
  within the interval): every renorm step maps to ``z ← (z << 1) | bit``
  regardless of E1/E2/E3, so the decoder consumes ``n1 + n3`` bits per
  symbol in at most two chunked window reads.  The symbol-locate formula
  ``value = ((z + 1)·count - 1)/range`` is codec.rs:131 with
  ``z = pending - low``.

Batching: every op is shaped ``(B, ...)`` over independent blocks, so the
sequential ``lax.scan`` is over symbol positions only while the VPU lanes
carry blocks.  Per-block output streams are bit-identical to the
reference/oracle (differential tests in tests/test_jax_codec.py).

Integer width policy (``Parameters.fits_u32``): uint32 when
``code_bits + freq_bits <= 32`` (native TPU ints), int64 otherwise
(products < 2**62 for code_bits <= 32, exact in XLA's emulated 64-bit).
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


def _clz(x, wdt):
    """Count leading zeros in the full dtype width (clz(0) = width)."""
    return jax.lax.clz(x).astype(jnp.int32)


def _word_bits(wdt) -> int:
    return 32 if wdt == jnp.uint32 else 64


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
      for that block (EOF symbol + extra bits + zero padding,
      codec.rs:91-99).
    """
    B, K = lo.shape
    wdt = coder_dtype(params)
    W = _word_bits(wdt)
    cb = params.code_bits
    half = jnp.asarray(params.code_half, wdt)
    q1 = jnp.asarray(params.code_one_fourth, wdt)
    cmax = jnp.asarray(params.code_max, wdt)
    cmax_half = jnp.asarray(params.code_max >> 1, wdt)  # mask with top bit clear
    one = jnp.asarray(1, wdt)
    zero = jnp.asarray(0, wdt)
    rows = jnp.arange(B)

    def flush_full(buf, nword, acc, accbits):
        full = accbits == 32
        idx = jnp.minimum(nword, n_words - 1)
        cur = buf[rows, idx]
        buf = buf.at[rows, idx].set(jnp.where(full, acc.astype(jnp.uint32), cur))
        nword = nword + full.astype(jnp.int32)
        acc = jnp.where(full, zero, acc)
        accbits = jnp.where(full, 0, accbits)
        return buf, nword, acc, accbits

    def append_bits(state, value, nbits, mask):
        """Append ``nbits`` (<= 32) of ``value`` to masked lanes.

        Maintains ``acc < 2**accbits``, ``accbits < 32``; at most two
        word-boundary chunks, statically unrolled (no data-dependent loop).
        """
        buf, nword, acc, accbits = state
        n = jnp.where(mask, nbits, 0).astype(jnp.int32)
        value = jnp.where(mask, value, zero)
        for _ in range(2):  # one word boundary can be crossed at most once
            m = jnp.minimum(n, 32 - accbits)
            msh = m.astype(wdt)
            rem = (n - m).astype(wdt)
            chunk = jnp.where(m > 0, value >> rem, zero) & ((one << msh) - one)
            acc = jnp.where(m > 0, (acc << msh) | chunk, acc)
            accbits = accbits + m
            value = value & ((one << rem) - one)
            n = n - m
            buf, nword, acc, accbits = flush_full(buf, nword, acc, accbits)
        return (buf, nword, acc, accbits)

    def append_run(state, bit, n, mask):
        """Append ``n`` copies of ``bit`` (n unbounded, expected tiny)."""
        n = jnp.where(mask, n, 0).astype(jnp.int32)

        def cond(c):
            return jnp.any(c[1] > 0)

        def body(c):
            state, n = c
            # Chunk cap 31 keeps every shift amount < dtype width.
            m = jnp.minimum(n, 31)
            pat = jnp.where(bit > 0, (one << m.astype(wdt)) - one, zero)
            state = append_bits(state, pat, m, n > 0)
            return (state, n - m)

        state, _ = jax.lax.while_loop(cond, body, (state, n))
        return state

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

        # Closed-form renorm counts.
        x = low ^ high
        n1 = jnp.where(active, _clz(x, wdt) - (W - cb), 0)
        # Shift out the n1 common bits (reference: per-iteration
        # (low<<1)&mask / ((high<<1)+1)&mask, codec.rs:87-88).
        n1w = n1.astype(wdt)
        low1 = jnp.where(active, (low << n1w) & cmax, low)
        high1 = jnp.where(active, ((high << n1w) | ((one << n1w) - one)) & cmax, high)
        # E3 count: leading 1s of low1 after its top 0 / leading 0s of high1
        # after its top 1 (only valid when tops differ, i.e. post-n1 state).
        shift_top = W - cb + 1
        low_sh = (low1 << shift_top).astype(wdt)
        high_sh = (high1 << shift_top).astype(wdt)
        a = _clz(~low_sh, wdt)
        b = _clz(high_sh, wdt)
        n3 = jnp.where(active, jnp.minimum(jnp.minimum(a, b), cb - 1), 0)
        n3w = n3.astype(wdt)
        low2 = jnp.where(active, (low1 << n3w) & cmax_half, low1)
        high2 = jnp.where(
            active, (((high1 << n3w) | ((one << n3w) - one)) & cmax_half) | half, high1
        )

        # Emission: [b1][pending opposite bits][remaining n1-1 prefix bits]
        # (put_bit semantics, codec.rs:39-46).
        emit = active & (n1 > 0)
        prefix = jnp.where(emit, low >> (jnp.asarray(cb, wdt) - n1.astype(wdt)), zero)
        b1 = prefix >> jnp.maximum(n1 - 1, 0).astype(wdt)
        rest = prefix & ((one << jnp.maximum(n1 - 1, 0).astype(wdt)) - one)
        state = (buf, nword, acc, accbits)
        state = append_bits(state, b1, jnp.ones_like(n1), emit)
        state = append_run(state, one - b1, pending, emit)
        state = append_bits(state, rest, n1 - 1, emit)
        pending = jnp.where(emit, 0, pending) + n3
        extra = extra - jnp.where(is_eof, n1 + n3, 0)

        # EOF epilogue: drain `extra` bits of low (codec.rs:91-99) with the
        # same emission pattern, then flush to a byte boundary.
        low = low2
        high = high2
        drain = is_eof & (extra > 0)
        ndr = jnp.where(drain, jnp.maximum(extra, 0), 0)
        dprefix = jnp.where(drain, low >> (jnp.asarray(cb, wdt) - ndr.astype(wdt)), zero)
        d1 = dprefix >> jnp.maximum(ndr - 1, 0).astype(wdt)
        drest = dprefix & ((one << jnp.maximum(ndr - 1, 0).astype(wdt)) - one)
        state = append_bits(state, d1, jnp.ones_like(ndr), drain)
        state = append_run(state, one - d1, pending, drain)
        state = append_bits(state, drest, ndr - 1, drain)
        pending = jnp.where(drain, 0, pending)
        buf, nword, acc, accbits = state

        # flush_bits: zero-pad to a byte (bitio/mod.rs:183-198) and
        # left-justify the tail word for big-endian byte extraction.
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
        jnp.full((B,), cb, jnp.int32),  # extra (codec.rs:33)
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

    The bitstream is consumed through a per-lane two-word register window
    (``cur``/``nxt``) refilled by at most one masked gather per read, so
    the hot loop is pure vector arithmetic — no per-bit I/O (the
    reference's get_bit-per-renorm-iteration, codec.rs:147-157, is
    replaced by chunked window reads of the same bits).
    """
    B, Wn = words.shape
    S = params.symbol_count
    wdt = coder_dtype(params)
    W = _word_bits(wdt)
    cb = params.code_bits
    half = jnp.asarray(params.code_half, wdt)
    cmax = jnp.asarray(params.code_max, wdt)
    cmax_half = jnp.asarray(params.code_max >> 1, wdt)
    one = jnp.asarray(1, wdt)
    u1 = jnp.uint32(1)
    freq_max = params.freq_max
    rows = jnp.arange(B)
    iota = jnp.arange(S + 1, dtype=jnp.int32)

    def read_bits(win, m):
        """Read ``m`` (<= 31) bits from the register window; 1 masked gather."""
        cur, avail, nxt, wordidx = win
        take1 = jnp.minimum(m, avail)
        t1s = (32 - take1).astype(jnp.uint32)
        v1 = jnp.where(take1 > 0, cur >> t1s, jnp.uint32(0))
        cur = jnp.where(take1 > 0, cur << take1.astype(jnp.uint32), cur)
        avail = avail - take1
        m2 = m - take1
        need2 = m2 > 0
        m2c = jnp.maximum(m2, 1).astype(jnp.uint32)
        v2 = jnp.where(need2, nxt >> (32 - m2c), jnp.uint32(0))
        cur = jnp.where(need2, nxt << m2c, cur)
        avail = jnp.where(need2, 32 - m2, avail)
        # Refill nxt (one gather, masked by need2).
        idx = jnp.minimum(wordidx, Wn - 1)
        loaded = words[rows, idx]
        nxt = jnp.where(need2, loaded, nxt)
        wordidx = wordidx + need2.astype(jnp.int32)
        val = ((v1 << m2c) | v2).astype(wdt)
        val = jnp.where(need2, val, v1.astype(wdt))
        return val, (cur, avail, nxt, wordidx)

    win0 = (
        words[:, 0],
        jnp.full((B,), 32, jnp.int32),
        words[:, 1] if Wn > 1 else jnp.zeros((B,), jnp.uint32),
        jnp.full((B,), 2, jnp.int32),
    )
    # Prime: z = first code_bits bits (z = pending - low with low = 0,
    # codec.rs:124-127).
    n_reads = 1 if cb <= 31 else 2
    z0 = jnp.zeros((B,), wdt)
    prime = jnp.full((B,), cb, jnp.int32)
    win = win0
    for _ in range(2):
        m = jnp.minimum(prime, 31)
        val, win = read_bits(win, m)
        z0 = (z0 << m.astype(wdt)) | val
        prime = prime - m

    def scan_step(carry, t):
        low, high, z, cdf, win = carry
        active = t < lens

        rng = high - low + one
        count = cdf[:, S].astype(wdt)
        value = ((z + one) * count - one) // rng  # codec.rs:131 with z=pending-low
        v32 = jnp.clip(value, 0, jnp.asarray(2**31 - 1, wdt)).astype(jnp.int32)
        # Rank-select on the dense cumulative row: first i with value < cdf[i+1].
        below = (cdf[:, 1:] <= v32[:, None]).astype(jnp.int32)
        sym = jnp.sum(below, axis=1)
        sym = jnp.minimum(sym, S - 1)
        # Bounds via masked reduction (gathers are slow on the TPU lanes).
        sel_lo = (iota[None, :] == sym[:, None]).astype(jnp.int32)
        sel_hi = (iota[None, :] == (sym + 1)[:, None]).astype(jnp.int32)
        flo = jnp.sum(cdf * sel_lo, axis=1).astype(wdt)
        fhi = jnp.sum(cdf * sel_hi, axis=1).astype(wdt)

        # Adapt: +1 above the symbol unless frozen (adaptive_linear.rs:33-39).
        upd = active & (cdf[:, S] < freq_max)
        cdf = cdf + ((iota[None, :] > sym[:, None]) & upd[:, None]).astype(jnp.int32)

        # Narrow; z moves with low (z' = pending - low').
        dlo = (rng * flo) // count
        nhigh = low + (rng * fhi) // count - one
        nlow = low + dlo
        z = jnp.where(active, z - dlo, z)
        low = jnp.where(active, nlow, low)
        high = jnp.where(active, nhigh, high)

        # Closed-form renorm counts (identical to the encoder's).
        x = low ^ high
        n1 = jnp.where(active, _clz(x, wdt) - (W - cb), 0)
        n1w = n1.astype(wdt)
        low1 = jnp.where(active, (low << n1w) & cmax, low)
        high1 = jnp.where(active, ((high << n1w) | ((one << n1w) - one)) & cmax, high)
        shift_top = W - cb + 1
        a = _clz(~((low1 << shift_top).astype(wdt)), wdt)
        b = _clz((high1 << shift_top).astype(wdt), wdt)
        n3 = jnp.where(active, jnp.minimum(jnp.minimum(a, b), cb - 1), 0)
        n3w = n3.astype(wdt)
        low = jnp.where(active, (low1 << n3w) & cmax_half, low1)
        high = jnp.where(
            active, (((high1 << n3w) | ((one << n3w) - one)) & cmax_half) | half, high1
        )

        # Consume n1 + n3 bits (n <= code_bits <= 32): z <- (z << n) | bits.
        n = n1 + n3
        for _ in range(n_reads):
            m = jnp.minimum(n, 31)
            val, win = read_bits(win, m)
            mw = m.astype(wdt)
            z = jnp.where(m > 0, (z << mw) | val, z)
            n = n - m

        out = jnp.where(active, sym, 0)
        if params.symbol_bits <= 8:  # uint8 minimizes the fetch transfer
            out = out.astype(jnp.uint8)
        return (low, high, z, cdf, win), out

    init = (
        jnp.full((B,), params.code_min, wdt),
        jnp.full((B,), params.code_max, wdt),
        z0,
        jnp.broadcast_to(init_cum.astype(jnp.int32), (B, S + 1)),
        win,
    )
    ts = jnp.arange(k, dtype=jnp.int32)
    _, syms = jax.lax.scan(scan_step, init, ts)
    return syms.T  # (B, k)


@jax.jit
def words_to_bytes_device(words):
    """(B, W) uint32 → (B, 4W) uint8, big-endian byte order.

    Host↔device transfers through the axon tunnel are far faster for
    uint8 than for wider dtypes, so compressed words are converted to
    bytes on-device before fetching.
    """
    b = words.shape[0]
    parts = [
        (words >> 24).astype(jnp.uint8),
        (words >> 16).astype(jnp.uint8),
        (words >> 8).astype(jnp.uint8),
        words.astype(jnp.uint8),
    ]
    return jnp.stack(parts, axis=-1).reshape(b, -1)


@jax.jit
def bytes_to_words_device(byts):
    """(B, 4W) uint8 → (B, W) uint32, big-endian byte order."""
    b = byts.shape[0]
    r = byts.reshape(b, -1, 4).astype(jnp.uint32)
    return (r[..., 0] << 24) | (r[..., 1] << 16) | (r[..., 2] << 8) | r[..., 3]


# Backwards-compatible alias used by high-level code.
CoderConfig = Parameters
