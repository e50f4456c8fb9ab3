"""Golden bitstream-format vectors for the bit I/O layer.

These vectors are transcribed from the reference's exact-semantics unit
tests (``/root/reference/src/bitio/tests.rs``) — they DEFINE the bitstream
format (MSB-first packing, zero-padded flush, byte-count checkpoints, EOF
behavior) and every implementation (host Python, native C++, JAX kernels)
must reproduce them bit-for-bit.
"""

import io

import pytest

from redux_tpu.bitio import BitReader, BitWriter, pack_bits
from redux_tpu.errors import EofError, InvalidInputError


def test_write_empty():  # bitio/tests.rs:8-18
    buf = io.BytesIO()
    w = BitWriter(buf)
    assert w.count == 0
    w.flush_bits()
    assert w.count == 0
    assert buf.getvalue() == b""


def test_write_bytes():  # bitio/tests.rs:20-34
    buf = io.BytesIO()
    w = BitWriter(buf)
    for i, b in enumerate([0x01, 0x02, 0x03], start=1):
        w.write_bits(b, 8)
        assert w.count == i
    assert buf.getvalue() == bytes([0x01, 0x02, 0x03])


def test_write_bits():  # bitio/tests.rs:36-66
    buf = io.BytesIO()
    w = BitWriter(buf)
    bits = [1, 0, 1, 0, 1, 0, 1]
    for b in bits:
        w.write_bits(b, 1)
    assert w.count == 0
    w.write_bits(0, 1)
    assert w.count == 1
    for b in [0, 0, 0, 0, 1, 1, 1]:
        w.write_bits(b, 1)
    assert w.count == 1
    w.write_bits(1, 1)
    assert w.count == 2
    assert buf.getvalue() == bytes([0b10101010, 0b1111])


def test_write_mixed():  # bitio/tests.rs:68-102
    buf = io.BytesIO()
    w = BitWriter(buf)
    for b in [1, 0, 1, 0, 1, 0, 1]:
        w.write_bits(b, 1)
    assert w.count == 0
    w.write_bits(0, 1)
    assert w.count == 1
    w.write_bits(0x00, 8)
    assert w.count == 2
    for b in [0, 0, 0, 0, 1, 1, 1]:
        w.write_bits(b, 1)
    assert w.count == 2
    w.write_bits(1, 1)
    assert w.count == 3
    w.write_bits(0xF0, 8)
    assert w.count == 4
    assert buf.getvalue() == bytes([0xAA, 0x00, 0x0F, 0xF0])


def test_write_flush():  # bitio/tests.rs:104-128
    buf = io.BytesIO()
    w = BitWriter(buf)
    w.flush_bits()
    assert w.count == 0
    for b in [1, 0, 1, 0]:
        w.write_bits(b, 1)
    assert w.count == 0
    w.flush_bits()
    assert w.count == 1
    w.write_bits(0, 1)
    assert w.count == 1
    w.flush_bits()
    assert w.count == 2
    w.flush_bits()
    assert w.count == 2
    assert buf.getvalue() == bytes([0xA0, 0x00])


def test_write_too_wide():  # bitio/mod.rs:149 InvalidInput
    w = BitWriter(io.BytesIO())
    with pytest.raises(InvalidInputError):
        w.write_bits(2, 1)
    with pytest.raises(InvalidInputError):
        w.write_bits(0x100, 8)
    with pytest.raises(InvalidInputError):
        w.write_bits(0, 65)


def test_read_eof():  # bitio/tests.rs:131-141
    r = BitReader(io.BytesIO(b""))
    assert r.count == 0
    for bits in [1, 8, 1, 8]:
        with pytest.raises(EofError):
            r.read_bits(bits)
    assert r.count == 0


def test_read_bytes():  # bitio/tests.rs:144-157
    r = BitReader(io.BytesIO(bytes([0x01, 0x02, 0x03])))
    assert r.count == 0
    for i, expect in enumerate([0x01, 0x02, 0x03], start=1):
        assert r.read_bits(8) == expect
        assert r.count == i
    with pytest.raises(EofError):
        r.read_bits(8)
    assert r.count == 3


def test_read_bits():  # bitio/tests.rs:159-185
    r = BitReader(io.BytesIO(bytes([0b10101010, 0b1111])))
    expect_first = [1, 0, 1, 0, 1, 0, 1, 0]
    for b in expect_first:
        assert r.read_bits(1) == b
    assert r.count == 1
    assert r.read_bits(1) == 0
    assert r.count == 2
    for b in [0, 0, 0, 1, 1, 1, 1]:
        assert r.read_bits(1) == b
    assert r.count == 2
    with pytest.raises(EofError):
        r.read_bits(8)
    assert r.count == 2


def test_read_mixed():  # bitio/tests.rs:187-218
    r = BitReader(io.BytesIO(bytes([0xAA, 0x00, 0x0F, 0xF0])))
    for b in [1, 0, 1, 0, 1, 0, 1, 0]:
        assert r.read_bits(1) == b
    assert r.count == 1
    assert r.read_bits(8) == 0x00
    assert r.count == 2
    assert r.read_bits(1) == 0
    assert r.count == 3
    for b in [0, 0, 0, 1, 1, 1, 1]:
        assert r.read_bits(1) == b
    assert r.count == 3
    assert r.read_bits(8) == 0xF0
    assert r.count == 4
    with pytest.raises(EofError):
        r.read_bits(8)
    assert r.count == 4


def test_read_too_wide():  # bitio/mod.rs:79-81
    r = BitReader(io.BytesIO(b"\x00" * 16))
    with pytest.raises(InvalidInputError):
        r.read_bits(65)


def test_pack_bits_helper():
    assert pack_bits([(1, 1), (0, 1), (1, 1), (0, 1)]) == bytes([0xA0])
    assert pack_bits([(0xAA, 8), (0x00, 8)]) == bytes([0xAA, 0x00])
    assert pack_bits([]) == b""
