"""Count-min sketch state codec: parse / merge / query the binary
state produced by Spark's `count_min_sketch` aggregate.

Spark exposes the CMS AGGREGATE natively but (unlike the HLL/KLL
families) no merge or estimate SQL functions — so stored per-partition
CMS state would be write-only. This module completes the triad
(HLL distinct / KLL quantiles / CMS frequencies) by implementing the
sketch's public serialization (version 1: int version, long
totalCount, int depth, int width, depth longs hashA, depth*width longs
table — the format of the Spark sketch library's CountMinSketch) and
its string-item hashing (Murmur3 x86_32 double hashing,
h_i = |(h1 + i*h2) mod width| with java-int wraparound — the
Guava/Cassandra bucket scheme) in pure Python.

Merging is elementwise table addition (valid iff depth/width/hashA
match — i.e. same eps/confidence/seed, which the operators pin);
estimation is the min over rows. Both run driver-side over
KILOBYTE-sized state — the data-sized work (building sketches) stays
in the JVM aggregate; this is the metadata tier, same cost model as
every other stored-state rollup here.

Estimation is implemented for STRING items (the operators cast columns
to string before sketching, exactly like the HLL path), byte-identical
to CountMinSketch.addString's UTF-8 bytes path — verified in tests by
exact-count agreement on collision-free sketches.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_M32 = 0xFFFFFFFF


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _M32
    k1 = ((k1 << 15) | (k1 >> 17)) & _M32
    return (k1 * 0x1B873593) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = ((h1 << 13) | (h1 >> 19)) & _M32
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """Spark's Murmur3_x86_32.hashUnsafeBytes: 4-byte little-endian
    words, then TAIL BYTES PROCESSED ONE AT A TIME as full mixed ints
    (signed java bytes) — not the standard murmur tail. Returns a java
    int (signed 32-bit)."""
    h1 = seed & _M32
    n4 = len(data) // 4 * 4
    for i in range(0, n4, 4):
        (k1,) = struct.unpack_from("<i", data, i)
        h1 = _mix_h1(h1, _mix_k1(k1 & _M32))
    for i in range(n4, len(data)):
        b = data[i]
        if b >= 128:
            b -= 256
        h1 = _mix_h1(h1, _mix_k1(b & _M32))
    r = _fmix(h1, len(data))
    return r - (1 << 32) if r >= (1 << 31) else r


@dataclass
class CountMin:
    total: int
    depth: int
    width: int
    hash_a: tuple[int, ...]
    table: list[int]  # row-major depth x width


def parse_cms(b: bytes) -> CountMin:
    if len(b) < 20:
        raise ValueError("truncated CountMinSketch payload (no header)")
    (version,) = struct.unpack_from(">i", b, 0)
    if version != 1:
        raise ValueError(f"unsupported CountMinSketch version {version}")
    (total,) = struct.unpack_from(">q", b, 4)
    depth, width = struct.unpack_from(">ii", b, 12)
    off = 20 + 8 * depth
    expected = off + 8 * depth * width
    # length checks BEFORE unpacking, so corrupt stored state raises
    # ValueError (catchable) rather than a raw struct.error
    if len(b) < expected:
        raise ValueError(
            f"truncated CountMinSketch payload: {len(b)} < {expected} bytes"
        )
    if len(b) > expected:
        raise ValueError(
            f"oversized CountMinSketch payload: {len(b)} > {expected} bytes"
        )
    hash_a = struct.unpack_from(f">{depth}q", b, 20)
    table = list(struct.unpack_from(f">{depth * width}q", b, off))
    return CountMin(total, depth, width, hash_a, table)


def serialize_cms(s: CountMin) -> bytes:
    return (
        struct.pack(">iqii", 1, s.total, s.depth, s.width)
        + struct.pack(f">{s.depth}q", *s.hash_a)
        + struct.pack(f">{s.depth * s.width}q", *s.table)
    )


def merge_cms(sketches: list[bytes | CountMin]) -> CountMin:
    """Elementwise merge; all inputs must share (depth, width, hashA)
    — guaranteed when built by the same aggregate expression (same
    eps/confidence/seed). Raises loudly on spec mismatch (a silent
    merge of incompatible sketches yields garbage counts)."""
    if not sketches:
        raise ValueError("nothing to merge")
    parsed = [s if isinstance(s, CountMin) else parse_cms(s) for s in sketches]
    first = parsed[0]
    out = CountMin(
        first.total, first.depth, first.width, first.hash_a, list(first.table)
    )
    for s in parsed[1:]:
        if (s.depth, s.width, s.hash_a) != (out.depth, out.width, out.hash_a):
            raise ValueError(
                "incompatible CountMinSketch specs: "
                f"{(s.depth, s.width)} vs {(out.depth, out.width)}"
            )
        out.total += s.total
        for i, v in enumerate(s.table):
            out.table[i] += v
    return out


def _buckets(data: bytes, depth: int, width: int) -> list[int]:
    h1 = murmur3_x86_32(data, 0)
    h2 = murmur3_x86_32(data, h1 & _M32)
    out = []
    for i in range(depth):
        c = h1 + i * h2
        c = ((c + (1 << 31)) & _M32) - (1 << 31)  # java int wraparound
        r = abs(c) % width  # java % keeps dividend sign; abs() after
        out.append(r)
    return out


def estimate_cms(sketch: bytes | CountMin, item: str | bytes) -> int:
    """Estimated count of a string item (UTF-8 bytes path) — min over
    the depth rows; overestimates by at most eps*total with the
    sketch's confidence, never underestimates."""
    s = sketch if isinstance(sketch, CountMin) else parse_cms(sketch)
    data = item.encode("utf-8") if isinstance(item, str) else item
    bs = _buckets(data, s.depth, s.width)
    return min(s.table[i * s.width + bs[i]] for i in range(s.depth))
