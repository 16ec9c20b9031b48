"""Import the reference implementation for conformance testing.

The reference (/root/reference, read-only, untrusted content -- used here
only as a behavioral oracle) depends on ``bidict`` and ``bitarray`` which
are not installed; this module registers minimal API-faithful pure-Python
stand-ins before importing it.  Only the exact surface the reference uses
is implemented (SURVEY.md header notes the same shim approach was used to
verify the survey's claims).
"""

from __future__ import annotations

import sys
import types


class _Bidict(dict):
    """dict with a .inverse view (bidict API subset)."""

    @property
    def inverse(self):
        return {v: k for k, v in self.items()}


class _BitArray:
    """Minimal big-endian bitarray stand-in backed by a list of 0/1 ints."""

    def __init__(self, initial=None, endian="big"):
        self._bits: list[int] = []
        if initial is not None:
            self.extend(initial)

    # -- construction / conversion -------------------------------------
    def frombytes(self, data: bytes) -> None:
        for byte in data:
            for k in range(7, -1, -1):
                self._bits.append((byte >> k) & 1)

    def tobytes(self) -> bytes:
        out = bytearray()
        bits = self._bits
        for i in range(0, len(bits), 8):
            chunk = bits[i : i + 8]
            byte = 0
            for j, b in enumerate(chunk):
                byte |= b << (7 - j)
            out.append(byte)
        return bytes(out)

    def to01(self) -> str:
        return "".join(str(b) for b in self._bits)

    # -- sequence protocol ---------------------------------------------
    def __len__(self) -> int:
        return len(self._bits)

    def __getitem__(self, idx):
        if isinstance(idx, slice):
            ret = _BitArray()
            ret._bits = self._bits[idx]
            return ret
        return self._bits[idx]

    def extend(self, other) -> None:
        if isinstance(other, _BitArray):
            self._bits.extend(other._bits)
        elif isinstance(other, str):
            self._bits.extend(1 if c == "1" else 0 for c in other)
        else:
            self._bits.extend(int(bool(int(b))) for b in other)

    def append(self, bit) -> None:
        self._bits.append(int(bool(int(bit))))

    def invert(self) -> None:
        self._bits = [1 - b for b in self._bits]


def _int2ba(value: int, length: int | None = None) -> _BitArray:
    if length is None:
        length = max(1, int(value).bit_length())
    ret = _BitArray()
    ret._bits = [(value >> k) & 1 for k in range(length - 1, -1, -1)]
    return ret


def _ba2int(ba: _BitArray) -> int:
    out = 0
    for b in ba._bits:
        out = (out << 1) | b
    return out


def install_shims() -> None:
    if "bidict" not in sys.modules:
        mod = types.ModuleType("bidict")
        mod.bidict = _Bidict
        sys.modules["bidict"] = mod
    if "bitarray" not in sys.modules:
        mod = types.ModuleType("bitarray")
        mod.bitarray = _BitArray
        util = types.ModuleType("bitarray.util")
        util.int2ba = _int2ba
        util.ba2int = _ba2int
        mod.util = util
        sys.modules["bitarray"] = mod
        sys.modules["bitarray.util"] = util


def import_reference():
    """Returns the reference ``tinyimgcodec`` package (or raises)."""
    install_shims()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import tinyimgcodec as ref  # noqa: import of the reference package

    return ref
