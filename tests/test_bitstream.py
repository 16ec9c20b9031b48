"""BitWriter/BitReader and vectorized symbol packing tests."""

import numpy as np
import pytest

from tinyimgcodec_tpu.bitstream import (
    BitReader,
    BitWriter,
    bytes_to_bits,
    pack_symbols,
)


def test_pack_symbols_basic():
    # "1010" + "11" + "" + "00000001" -> 10101100 000001(00 pad)
    out = pack_symbols(
        np.array([0b1010, 0b11, 0, 1], dtype=np.uint64),
        np.array([4, 2, 0, 8], dtype=np.int64),
    )
    assert out == bytes([0b10101100, 0b00000100])


def test_pack_symbols_64bit():
    v = 0xDEADBEEFCAFEBABE
    out = pack_symbols(np.array([v], dtype=np.uint64), np.array([64]))
    assert out == v.to_bytes(8, "big")


def test_pack_symbols_random_vs_manual():
    rng = np.random.RandomState(0)
    n = 1000
    lengths = rng.randint(0, 25, size=n)
    values = rng.randint(0, 1 << 24, size=n).astype(np.uint64) & (
        (np.uint64(1) << lengths.astype(np.uint64)) - np.uint64(1)
    )
    manual = "".join(
        format(int(v), f"0{int(l)}b") if l else ""
        for v, l in zip(values, lengths)
    )
    manual += "0" * (-len(manual) % 8)
    expect = int(manual, 2).to_bytes(len(manual) // 8, "big") if manual else b""
    assert pack_symbols(values, lengths) == expect


def test_writer_reader_roundtrip():
    w = BitWriter()
    w.write_uint(0xABCD, 16)
    w.write_bits(0b101, 3)
    w.write_uint(7, 5)
    data = w.to_bytes()
    r = BitReader(data)
    assert r.read_uint(16) == 0xABCD
    assert r.read_uint(3) == 0b101
    assert r.read_uint(5) == 7


@pytest.mark.parametrize("value", [1, -1, 5, -5, 255, -255, 1023, -1024, 2047])
def test_signed_magnitude_roundtrip(value):
    # JPEG convention: |v|.bit_length() bits; negatives one's-complemented
    # (reference bitbuffer.py:47-66 semantics).
    w = BitWriter()
    w.write_int(value)
    nbits = abs(value).bit_length()
    r = BitReader(w.to_bytes())
    assert r.read_int(nbits) == value


def test_write_int_zero_writes_nothing():
    w = BitWriter()
    w.write_int(0)
    assert w.to_bytes() == b""
    assert BitReader(b"").read_int(0) == 0


def test_negative_is_ones_complement():
    w = BitWriter()
    w.write_int(-5)  # |−5|=101 -> inverted 010
    bits = bytes_to_bits(w.to_bytes())[:3]
    assert list(bits) == [0, 1, 0]


def test_write_bytes_and_read_bytes():
    w = BitWriter()
    w.write_bytes(b"\x12\x34\x56")
    r = BitReader(w.to_bytes())
    assert r.read_bytes(3) == b"\x12\x34\x56"


def test_reader_eof():
    r = BitReader(b"\xff")
    r.read_uint(8)
    with pytest.raises(EOFError):
        r.read_uint(1)
