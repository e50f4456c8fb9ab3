"""High-level block-parallel compress/decompress API.

``encode(data) -> archive`` / ``decode(archive) -> data``: the redux_tpu
equivalents of the reference's ``compress``/``decompress`` (lib.rs:102-120),
but running the TPU-native block-parallel data path:

1. split input into fixed-size blocks (the codec analog of context
   parallelism — SURVEY.md §5);
2. derive the warm-start prior from the global byte histogram;
3. precompute every block's per-symbol model values in parallel
   (:mod:`redux_tpu.ops.ranks`);
4. run the vectorized interval coder over all blocks at once
   (:mod:`redux_tpu.ops.coder`);
5. splice per-block streams into an RXT1 archive
   (:mod:`redux_tpu.container`).

Reference-format single streams (no container) are handled by
:mod:`redux_tpu.oracle` (and the native C++ path) — see
:func:`decode_auto`.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from . import container, oracle
from .container import DEFAULT_BLOCK_SIZE, DEFAULT_PRIOR_BUDGET
from .errors import InvalidInputError
from .models.dense import prior_init_cum, quantize_prior, uniform_init_cum
from .ops.bitpack import streams_to_words, words_to_streams
from .ops.coder import (
    bytes_to_words_device,
    decode_blocks,
    encode_blocks,
    encode_blocks_fast,
    max_block_words,
    words_to_bytes_device,
)
from .ops.ranks import precompute_encode_model
from .params import Parameters


def _pad_lanes(n: int) -> int:
    """Round the lane count up to limit jit recompilation across inputs.

    Multiples of 256 keep the lane (minor) dimension aligned to the VPU's
    128-wide registers with at most ~10% padding waste for large inputs
    (a power-of-two policy wastes up to 2x); tiny inputs snap to powers
    of two so the smallest shapes stay cache-friendly across calls.
    """
    if n <= 256:
        return 1 << max(2, math.ceil(math.log2(max(n, 1))))
    return ((n + 255) // 256) * 256


def _static_words(params: Parameters, k: int) -> int:
    # Static (shape-stable) per-block buffer bound: worst-case initial total
    # is symbol_count + prior budget.
    max_count = min(params.symbol_count + DEFAULT_PRIOR_BUDGET + k, params.freq_max)
    return max_block_words(max_count, params.symbol_count, params, k)


def _split_blocks(data: bytes, block_size: int):
    n_blocks = (len(data) + block_size - 1) // block_size
    lens = np.full(n_blocks, block_size, dtype=np.int32)
    if len(data) % block_size:
        lens[-1] = len(data) % block_size
    b_pad = _pad_lanes(n_blocks)
    k = block_size
    # uint8 on purpose: the host->device path is fastest for bytes; the
    # rank kernel widens on-device.
    syms = np.zeros(b_pad * k, dtype=np.uint8)
    syms[: len(data)] = np.frombuffer(data, dtype=np.uint8)
    syms = syms.reshape(b_pad, k)
    lens_pad = np.zeros(b_pad, dtype=np.int32)
    lens_pad[:n_blocks] = lens
    return syms, lens_pad, n_blocks


def _init_cum(params: Parameters, prior_extra: Optional[np.ndarray]) -> np.ndarray:
    if prior_extra is None:
        return uniform_init_cum(params).astype(np.int32)
    full = np.zeros(params.symbol_count, dtype=np.int64)
    full[:256] = prior_extra
    return prior_init_cum(full, params).astype(np.int32)


def encode(
    data: bytes,
    params: Optional[Parameters] = None,
    block_size: int = DEFAULT_BLOCK_SIZE,
    use_prior: Optional[bool] = None,
    prior_budget: int = DEFAULT_PRIOR_BUDGET,
) -> bytes:
    """Compress ``data`` into an RXT1 block-parallel archive.

    The default configuration is :meth:`Parameters.tpu32` — uint32-native
    interval arithmetic and an int16 model row on device.  The archive
    header records the parameters, so any valid config round-trips.
    """
    params = params or Parameters.tpu32()
    if params.symbol_bits != 8:
        raise InvalidInputError()  # byte-oriented container
    if use_prior is None:
        use_prior = len(data) >= 4096
    prior_extra = None
    if use_prior and len(data) > 0:
        hist = np.bincount(np.frombuffer(data, dtype=np.uint8), minlength=256)
        budget = min(prior_budget, params.freq_max // 4)
        prior_extra = quantize_prior(hist, params, budget)[:256]
        if prior_extra.max(initial=0) == 0:
            prior_extra = None
    ic = _init_cum(params, prior_extra)

    if len(data) == 0:
        return container.build_archive(params, block_size, 0, [], prior_extra)

    syms, lens, n_blocks = _split_blocks(data, block_size)
    k = syms.shape[1]
    lo, hi, tot, el, eh, et = precompute_encode_model(
        jnp.asarray(syms), jnp.asarray(lens), jnp.asarray(ic), params.freq_max
    )
    n_words = _static_words(params, k)
    lens_j = jnp.asarray(lens)
    if params.fits_u32:
        words, byte_lens, ovf = encode_blocks_fast(
            lo, hi, tot, el, eh, et, lens_j, params, n_words
        )
        ovf = np.asarray(ovf)
        if ovf.any():
            # Pathological E3 pending runs (> 64 bits, probability ~2^-47
            # per symbol): re-encode the flagged lanes with the
            # reference-shaped encoder — identical stream format.
            sel = np.nonzero(ovf)[0]
            sub = tuple(jnp.asarray(np.asarray(x)[sel]) for x in (lo, hi, tot, el, eh, et))
            w_fb, bl_fb = encode_blocks(*sub, lens_j[sel], params, n_words)
            words = jnp.asarray(np.asarray(words)).at[sel].set(w_fb)
            byte_lens = jnp.asarray(np.asarray(byte_lens)).at[sel].set(bl_fb)
    else:
        words, byte_lens = encode_blocks(
            lo, hi, tot, el, eh, et, lens_j, params, n_words
        )
    byte_lens = np.asarray(byte_lens)
    if int(byte_lens[:n_blocks].max(initial=0)) > 4 * n_words:
        raise InvalidInputError()  # buffer bound violated — never silent
    # Trim to the words actually used and fetch as uint8 (fast transfer).
    wcap = _pad_lanes(max(1, -(-int(byte_lens[:n_blocks].max(initial=1)) // 4)))
    wcap = min(wcap, n_words)
    byts = np.asarray(words_to_bytes_device(words[:, :wcap]))
    streams = [
        byts[i, : byte_lens[i]].tobytes() for i in range(n_blocks)
    ]
    return container.build_archive(params, block_size, len(data), streams, prior_extra)


def decode(archive: bytes) -> bytes:
    """Decompress an RXT1 archive produced by :func:`encode`."""
    header, streams = container.parse_archive(archive)
    params = header.params
    if header.orig_len == 0:
        return b""
    prior = header.prior_extra
    ic = _init_cum(params, prior)
    n_blocks = header.n_blocks
    block_lens = np.asarray(header.block_lens, dtype=np.int32)
    k = header.block_size
    n_words = _static_words(params, k)
    b_pad = _pad_lanes(n_blocks)
    # Ship compressed bytes to the device as uint8 (fast transfer path),
    # sized to the words actually needed; pack to u32 on-device.
    wcap = _pad_lanes(max(2, -(-max(header.block_byte_lens) // 4)))
    wcap = min(wcap, n_words)
    byts = np.zeros((b_pad, wcap * 4), dtype=np.uint8)
    for i, s in enumerate(streams):
        byts[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    lens_pad = np.zeros(b_pad, dtype=np.int32)
    lens_pad[:n_blocks] = block_lens
    words = bytes_to_words_device(jnp.asarray(byts))
    syms = np.asarray(
        decode_blocks(words, jnp.asarray(lens_pad), jnp.asarray(ic), params, k)
    )
    # Blocks are contiguous and full-sized except the last, so the flattened
    # symbol matrix's first orig_len entries are exactly the original bytes.
    return syms[:n_blocks].astype(np.uint8).reshape(-1)[: header.orig_len].tobytes()


def encode_auto(
    data: bytes,
    params: Optional[Parameters] = None,
    block_size: int = DEFAULT_BLOCK_SIZE,
) -> bytes:
    """Compress picking the smallest of three self-decodable candidates.

    1. RXT1 with the warm-start prior (wins on large/skewed inputs);
    2. RXT1 with uniform init (wins when the prior table doesn't pay);
    3. a bare reference-format stream (wins on small inputs where any
       container overhead exceeds the block-parallel gain — byte-identical
       to what the reference CLI would emit, main.rs:108).

    All three are recognized by :func:`decode_auto`, so the choice is
    invisible to the decoder.  Guarantees output never larger than the
    reference's for the same parameters (BASELINE.md size target).
    """
    params = params or Parameters.tpu32()
    candidates = [encode(data, params=params, block_size=block_size, use_prior=True)]
    if len(data) >= 4096:  # without a prior the two rxt variants coincide
        candidates.append(
            encode(data, params=params, block_size=block_size, use_prior=False)
        )
    if len(data) <= (1 << 20):  # serial encode is cheap for small inputs
        # Bare streams carry no parameter header, so this candidate always
        # uses the reference CLI config (main.rs:108) — byte-identical to
        # the reference's own output, which also anchors the size
        # guarantee vs. the reference.
        ref_params = Parameters.default()
        try:
            from . import native

            candidates.append(native.compress_bytes(data, ref_params))
        except Exception:
            from .models.fenwick import AdaptiveFenwickModel

            if len(data) <= (1 << 16):
                candidates.append(
                    oracle.compress_bytes(data, AdaptiveFenwickModel(ref_params))
                )
    return min(candidates, key=len)


def decode_auto(data: bytes, params: Optional[Parameters] = None) -> bytes:
    """Decode either an RXT1 archive or a bare reference-format stream.

    Reference streams carry no magic (lib.rs:102-120), so anything that is
    not an RXT1 archive is decoded sequentially with the reference-format
    codec using ``params`` (default: the reference CLI config, main.rs:108).
    """
    if container.is_rxt_archive(data):
        return decode(data)
    try:
        from . import native

        return native.decompress_bytes(data, params)
    except (ImportError, RuntimeError):  # pragma: no cover - build issues only
        # (codec errors are ReduxError, not RuntimeError — they propagate)
        model = None
        if params is not None:
            from .models.fenwick import AdaptiveFenwickModel

            model = AdaptiveFenwickModel(params)
        return oracle.decompress_bytes(data, model)
