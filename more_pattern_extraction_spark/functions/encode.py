"""Chunk codecs: delta-of-delta timestamps + Gorilla-XOR float streams.

Implements the value/timestamp compression scheme of the Gorilla TSDB
paper (Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time Series
Database", VLDB 2015 — public) for the engine's per-partition chunk
structs (BASELINE.json north rule).  These are *queryable artifacts* —
Parquet's own page encodings are orthogonal storage-level concerns.

Pure functions over numpy arrays; used inside grouped pandas UDFs
(operators/chunks.py), never per Spark row.  The bit-packing loop is
per-chunk Python-over-ints (chunks are a few thousand points); a numba/C
kernel is a drop-in upgrade since the wire format is fixed.

Wire formats
------------
timestamps (int64, e.g. epoch-us bucket starts):
  [first:64][delta0: zigzag-varint] then per point a DoD token:
  '0' → dod == 0
  '10'   + 7-bit  zigzag(dod)   (|dod| < 2^6)
  '110'  + 14-bit zigzag(dod)   (|dod| < 2^13)
  '1110' + 24-bit zigzag(dod)   (|dod| < 2^23)
  '1111' + 64-bit zigzag(dod)
values (float64, NaN-safe — NaN is a bit pattern like any other):
  [first:64] then per point:
  '0' → identical to previous (xor == 0)
  '10' + meaningful bits, reusing the previous (lz, mbits) block
  '11' + 5-bit lz + 6-bit (mbits-1) + mbits meaningful bits
"""

from __future__ import annotations

import numpy as np

_MASK64 = (1 << 64) - 1


class BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, nbits: int) -> int:
        pos = self.pos
        self.pos = pos + nbits
        if nbits == 1:
            return (self.data[pos >> 3] >> (7 - (pos & 7))) & 1
        byte_start = pos >> 3
        byte_end = (pos + nbits + 7) >> 3
        chunk = int.from_bytes(self.data[byte_start:byte_end], "big")
        shift = (byte_end - byte_start) * 8 - (pos - (byte_start << 3)) - nbits
        return (chunk >> shift) & ((1 << nbits) - 1)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _wrap64(v: int) -> int:
    """Reduce to signed int64 (numpy diff/cumsum arithmetic is modular)."""
    v &= _MASK64
    return v - (1 << 64) if v >= (1 << 63) else v


def encode_dod(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode an int64 array (non-decreasing not required)."""
    ts = np.asarray(ts, dtype=np.int64)
    n = len(ts)
    w = BitWriter()
    if n == 0:
        return w.getvalue()
    w.write(int(ts[0]) & _MASK64, 64)
    if n == 1:
        return w.getvalue()
    deltas = np.diff(ts)
    w.write(_zigzag(int(deltas[0])) & _MASK64, 64)
    dods = np.diff(deltas)
    for d in dods.tolist():
        if d == 0:
            w.write(0, 1)
            continue
        z = _zigzag(d)
        if z < (1 << 7):
            w.write(0b10, 2)
            w.write(z, 7)
        elif z < (1 << 14):
            w.write(0b110, 3)
            w.write(z, 14)
        elif z < (1 << 24):
            w.write(0b1110, 4)
            w.write(z, 24)
        else:
            w.write(0b1111, 4)
            w.write(z & _MASK64, 64)
    return w.getvalue()


def decode_dod(buf: bytes, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    r = BitReader(buf)
    first = r.read(64)
    if first >= 1 << 63:
        first -= 1 << 64
    out[0] = first
    if n == 1:
        return out
    delta = _unzigzag(r.read(64))
    out[1] = _wrap64(int(out[0]) + delta)
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        else:
            if r.read(1) == 0:
                dod = _unzigzag(r.read(7))
            elif r.read(1) == 0:
                dod = _unzigzag(r.read(14))
            elif r.read(1) == 0:
                dod = _unzigzag(r.read(24))
            else:
                dod = _unzigzag(r.read(64))
        delta = _wrap64(delta + dod)
        out[i] = _wrap64(int(out[i - 1]) + delta)
    return out


def encode_gorilla(vals: np.ndarray) -> bytes:
    """Gorilla XOR-encode a float64 array (NaNs round-trip bit-exactly)."""
    bits = np.asarray(vals, dtype=np.float64).view(np.uint64)
    n = len(bits)
    w = BitWriter()
    if n == 0:
        return w.getvalue()
    prev = int(bits[0])
    w.write(prev, 64)
    lz_prev, mb_prev = -1, -1  # previous meaningful block
    for i in range(1, n):
        cur = int(bits[i])
        x = prev ^ cur
        prev = cur
        if x == 0:
            w.write(0, 1)
            continue
        blen = x.bit_length()
        lz = 64 - blen
        if lz > 31:
            lz = 31
        tz = (x & -x).bit_length() - 1
        mb = 64 - lz - tz
        if lz_prev >= 0 and lz >= lz_prev and (64 - lz_prev - mb_prev) <= tz:
            # fits inside the previous block → '10' + reuse block
            w.write(0b10, 2)
            w.write(x >> (64 - lz_prev - mb_prev), mb_prev)
        else:
            w.write(0b11, 2)
            w.write(lz, 5)
            w.write(mb - 1, 6)
            w.write(x >> tz, mb)
            lz_prev, mb_prev = lz, mb
    return w.getvalue()


def decode_gorilla(buf: bytes, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    r = BitReader(buf)
    prev = r.read(64)
    out[0] = prev
    lz_prev = mb_prev = 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 0:
            mbits = r.read(mb_prev)
            x = mbits << (64 - lz_prev - mb_prev)
        else:
            lz_prev = r.read(5)
            mb_prev = r.read(6) + 1
            mbits = r.read(mb_prev)
            x = mbits << (64 - lz_prev - mb_prev)
        prev ^= x
        out[i] = prev
    return out.view(np.float64)


def encode_gorilla_masked(vals: np.ndarray) -> bytes:
    """Gorilla with an explicit NaN policy: encodes the raw doubles —
    provided because pandas NULL→NaN conversion must survive the trip;
    alias kept for API clarity."""
    return encode_gorilla(vals)
