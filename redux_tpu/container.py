"""RXT1 block-parallel archive format.

The reference emits one bare stream per file with no framing (lib.rs:102-120)
— inherently sequential to decode.  The redux_tpu container splits input
into fixed-size blocks, each encoded independently with a freshly
initialized model, so encode AND decode are data-parallel across TPU lanes,
chips, and hosts.  Every per-block payload is a complete reference-format
stream (EOF symbol, extra-bit drain, zero-padded flush — codec.rs:91-99),
so a single-block archive's payload with a uniform prior is byte-identical
to what the reference would emit for the whole input.

Layout (all integers little-endian):

====== ====== ==========================================================
offset size   field
====== ====== ==========================================================
0      4      magic ``b"RXT1"``
4      1      version (1)
5      1      flags: bit0 = has_prior
6      1      symbol_bits   (Parameters, model/mod.rs:63-81)
7      1      freq_bits
8      1      code_bits
9      3      reserved (0)
12     4      block_size: symbols per block
16     8      orig_len: total decoded byte count
24     4      n_blocks
28     4*n    per-block compressed byte lengths
...    512    warm-start prior: 256 x u16 extra counts (if has_prior)
...    —      payload: concatenated per-block streams (byte-aligned)
====== ====== ==========================================================

The warm-start prior is a redux_tpu extension: a quantized global byte
histogram seeds every block's adaptive model (see
:func:`redux_tpu.models.dense.quantize_prior`), recovering the per-block
model-reset cost and beating the reference's cold uniform start.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import List, Optional

import numpy as np

from .errors import InvalidInputError
from .params import Parameters

MAGIC = b"RXT1"
VERSION = 1
FLAG_PRIOR = 1

DEFAULT_BLOCK_SIZE = 1 << 16  # 64 KiB of symbols per block
# Warm-start budget: initial total stays ~32k counts, leaving adaptation
# headroom under freq_max for the default (8,30,32) config.
DEFAULT_PRIOR_BUDGET = 1 << 15


@dataclasses.dataclass(frozen=True)
class ArchiveHeader:
    params: Parameters
    block_size: int
    orig_len: int
    block_byte_lens: List[int]
    prior_extra: Optional[np.ndarray]  # (256,) int64 extra counts, or None

    @property
    def n_blocks(self) -> int:
        return len(self.block_byte_lens)

    @property
    def block_lens(self) -> List[int]:
        """Per-block symbol counts derived from orig_len and block_size."""
        out = []
        remaining = self.orig_len
        for _ in range(self.n_blocks):
            n = min(self.block_size, remaining)
            out.append(n)
            remaining -= n
        return out


def build_archive(
    header_params: Parameters,
    block_size: int,
    orig_len: int,
    block_streams: List[bytes],
    prior_extra: Optional[np.ndarray],
) -> bytes:
    p = header_params
    flags = FLAG_PRIOR if prior_extra is not None else 0
    head = bytearray()
    head += MAGIC
    head += struct.pack(
        "<BBBBB3x", VERSION, flags, p.symbol_bits, p.freq_bits, p.code_bits
    )
    head += struct.pack("<IQI", block_size, orig_len, len(block_streams))
    head += struct.pack(f"<{len(block_streams)}I", *(len(s) for s in block_streams))
    if prior_extra is not None:
        if prior_extra.shape != (256,) or prior_extra.max(initial=0) > 0xFFFF:
            raise InvalidInputError()
        head += prior_extra.astype("<u2").tobytes()
    return bytes(head) + b"".join(block_streams)


def parse_archive(archive: bytes) -> tuple[ArchiveHeader, List[bytes]]:
    """Parse an RXT1 archive into its header and per-block payload streams."""
    if len(archive) < 28 or archive[:4] != MAGIC:
        raise InvalidInputError()
    version, flags, sb, fb, cb = struct.unpack_from("<BBBBB", archive, 4)
    if version != VERSION:
        raise InvalidInputError()
    block_size, orig_len, n_blocks = struct.unpack_from("<IQI", archive, 12)
    params = Parameters(sb, fb, cb)
    off = 28
    if len(archive) < off + 4 * n_blocks:
        raise InvalidInputError()
    byte_lens = list(struct.unpack_from(f"<{n_blocks}I", archive, off))
    off += 4 * n_blocks
    prior = None
    if flags & FLAG_PRIOR:
        if len(archive) < off + 512:
            raise InvalidInputError()
        prior = (
            np.frombuffer(archive, dtype="<u2", count=256, offset=off)
            .astype(np.int64)
            .copy()
        )
        off += 512
    streams = []
    for n in byte_lens:
        if len(archive) < off + n:
            raise InvalidInputError()
        streams.append(archive[off : off + n])
        off += n
    header = ArchiveHeader(params, block_size, orig_len, byte_lens, prior)
    if block_size == 0 and orig_len > 0:
        raise InvalidInputError()
    expect_blocks = (orig_len + block_size - 1) // block_size if orig_len else 0
    if expect_blocks != n_blocks:
        raise InvalidInputError()
    return header, streams


def is_rxt_archive(data: bytes) -> bool:
    return data[:4] == MAGIC
