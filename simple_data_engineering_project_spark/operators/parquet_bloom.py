"""Parquet split-block bloom filters — the READ side.

The last rung of the parquet I/O-elimination ladder (row-group zone
maps → page index → bloom): a point-lookup predicate whose needle key
sits INSIDE every row group's [min, max] range defeats the statistics
entirely, and the split-block bloom filter (SBBF) is the structure the
format provides for exactly that case. Each column chunk may carry a
filter (ColumnMetaData field 14 ``bloom_filter_offset`` / field 15
``bloom_filter_length``); the filter is a thrift-compact
``BloomFilterHeader`` (numBytes + algorithm/hash/compression unions)
followed by ``numBytes`` bytes of 32-byte blocks. A key is hashed with
XXH64(seed=0) over its PLAIN encoding; the upper 32 hash bits pick a
block, the lower 32 drive eight salted bit probes (one per 32-bit word
of the block). Absence of any probed bit proves the key absent from
the row group — no false negatives — so a reader may skip the whole
group without decoding a page.

In-container honesty basis: pyarrow 16.1 and DuckDB 1.0 can neither
write nor read these filters, but Spark's own JVM writer emits them
(``parquet.bloom.filter.enabled#col=true`` — parquet-mr's
BlockSplitBloomFilter), so the decode path is graded on Spark-written
files and the XXH64 core is cross-validated against Spark's
``F.xxhash64`` (same algorithm, seed 42) in the unit battery. The
stats-trust contract matches the zone-map/page-index scans: filter
bytes are trusted as written (a corrupted filter may legally drop
groups, never fabricate rows — the exact row filter downstream keeps
survivors correct), and anything structurally unreadable falls back
to a conservative full-group decode.

Reference behavior source: the public parquet format spec
(BloomFilter.md / parquet.thrift) and the reference repo's delegated
point-lookup shape (Simple-Data-Engineering-Project dag.py:159 key
lookups land in PostgreSQL; this module gives the same lookup an
I/O-eliminating scan path on immutable parquet instead).
"""
from __future__ import annotations

import struct

_M64 = (1 << 64) - 1
_PRIME1 = 0x9E3779B185EBCA87
_PRIME2 = 0xC2B2AE3D27D4EB4F
_PRIME3 = 0x165667B19E3779F9
_PRIME4 = 0x85EBCA77C2B2AE63
_PRIME5 = 0x27D4EB2F165667C5

# parquet-format BloomFilter.md block salts — one per 32-bit word
_SALT = (
    0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
    0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31,
)

# physical types (mirrors parquet_data's constants; kept literal so
# this module is importable standalone on executors)
_BOOLEAN, _INT32, _INT64, _INT96 = 0, 1, 2, 3
_FLOAT, _DOUBLE, _BYTE_ARRAY, _FLBA = 4, 5, 6, 7


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xx_round(acc: int, inp: int) -> int:
    acc = (acc + inp * _PRIME2) & _M64
    return (_rotl64(acc, 31) * _PRIME1) & _M64


def _xx_merge(acc: int, val: int) -> int:
    acc ^= _xx_round(0, val)
    return (acc * _PRIME1 + _PRIME4) & _M64


def xxhash64(data: bytes, seed: int = 0) -> int:
    """XXH64 over ``data`` (unsigned 64-bit result). The hash the SBBF
    spec mandates (seed 0); the unit battery pins it bit-exactly
    against Spark's ``F.xxhash64`` (same core, seed 42) across ints,
    strings, and length classes covering every tail branch."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _PRIME1 + _PRIME2) & _M64
        v2 = (seed + _PRIME2) & _M64
        v3 = seed & _M64
        v4 = (seed - _PRIME1) & _M64
        while i <= n - 32:
            v1 = _xx_round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _xx_round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _xx_round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _xx_round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        h = _xx_merge(h, v1)
        h = _xx_merge(h, v2)
        h = _xx_merge(h, v3)
        h = _xx_merge(h, v4)
    else:
        h = (seed + _PRIME5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _xx_round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl64(h, 27) * _PRIME1 + _PRIME4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _PRIME1) & _M64
        h = (_rotl64(h, 23) * _PRIME2 + _PRIME3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _PRIME5) & _M64
        h = (_rotl64(h, 11) * _PRIME1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _PRIME2) & _M64
    h ^= h >> 29
    h = (h * _PRIME3) & _M64
    h ^= h >> 32
    return h


def plain_encode(v, ptype: int, type_length: int = 0) -> bytes:
    """A single value's PLAIN encoding — the byte string the SBBF spec
    hashes. BYTE_ARRAY hashes its raw bytes WITHOUT the 4-byte length
    prefix (parquet-mr hashes Binary.getBytes)."""
    if ptype == _INT32:
        return struct.pack("<i", v)
    if ptype == _INT64:
        return struct.pack("<q", v)
    if ptype == _FLOAT:
        return struct.pack("<f", v)
    if ptype == _DOUBLE:
        return struct.pack("<d", v)
    if ptype in (_BYTE_ARRAY, _FLBA):
        if isinstance(v, str):
            return v.encode("utf-8")
        return bytes(v)
    raise NotImplementedError(
        f"bloom filters are not defined for physical type {ptype}"
    )


def sbbf_contains(bitset: bytes, h: int) -> bool:
    """Probe one split-block bloom filter bitset. ``h`` is the XXH64
    of the key's plain encoding. True = maybe present (all eight
    salted bits set in the selected 32-byte block); False = PROVEN
    absent."""
    num_blocks = len(bitset) >> 5
    if num_blocks == 0:
        return True  # degenerate filter: conservative
    block = (((h >> 32) & 0xFFFFFFFF) * num_blocks) >> 32
    base = block << 5
    x = h & 0xFFFFFFFF
    for i in range(8):
        bit = ((x * _SALT[i]) & 0xFFFFFFFF) >> 27
        (word,) = struct.unpack_from("<I", bitset, base + 4 * i)
        if not (word >> bit) & 1:
            return False
    return True


def read_bloom_filter(buf: bytes, md: dict) -> bytes | None:
    """Decode one column chunk's bloom filter bitset from
    ``bloom_filter_offset`` (ColumnMetaData field 14). Returns the raw
    SBBF bitset bytes, or None when the chunk carries no filter or the
    header declares an algorithm/hash/compression this reader does not
    speak (only BLOCK + XXHASH + UNCOMPRESSED exist in the format as
    of parquet-format 2.10 — but unions are open, so decline loudly
    into the conservative path rather than mis-probe)."""
    from .parquet_data import _Compact

    off = md.get(14)
    if off is None:
        return None
    c = _Compact(buf, off)
    header = c.struct()
    num_bytes = header.get(1)
    if not isinstance(num_bytes, int) or num_bytes <= 0:
        return None
    if num_bytes & 31 or c.pos + num_bytes > len(buf):
        return None  # structurally invalid: conservative
    # unions: {1: {}} means the first (only defined) variant
    if 1 not in header.get(2, {}) or 1 not in header.get(3, {}) or (
        1 not in header.get(4, {})
    ):
        return None
    length = md.get(15)
    if length is not None and length < num_bytes:
        return None
    return buf[c.pos : c.pos + num_bytes]


def read_parquet_bloom_pruned_bytes(
    buf: bytes,
    columns: list[str],
    key_col: str,
    needles: list,
) -> tuple[dict[str, list], int, int, int]:
    """Point-lookup scan with BLOOM-FILTER row-group skipping: decode
    only the row groups whose ``key_col`` split-block bloom filter
    admits at least one needle (zone maps are consulted first — a
    needle outside [min, max] never reaches the filter). Returns
    ``(columns dict, groups_decoded, groups_total, groups_filtered)``
    where ``groups_filtered`` counts groups whose key chunk DECLARES a
    filter (ColumnMetaData field 14 — a metadata-only presence check;
    the filter bytes themselves are only fetched and probed for groups
    the zone maps could not already eliminate, which is the I/O order
    a remote-storage reader wants). Surviving rows pass the exact ``key in needles`` filter,
    so a false-positive block admission never surfaces a wrong row and
    the result is independent of filter quality. Groups without a
    filter (or with an undecodable one) read conservatively — the same
    trust contract as the zone-map and page-index scans.
    """
    from .parquet_data import _parse_file, _decode_row_group
    from .parquet_meta import decode_stat_value

    meta, schema = _parse_file(buf)
    if key_col not in schema or schema[key_col]["max_rep"] > 0:
        raise NotImplementedError(
            f"bloom scan supports flat scalar key columns; {key_col!r}"
        )
    ptype = schema[key_col]["type"]
    tlen = schema[key_col]["type_length"]
    enc_needles = [plain_encode(v, ptype, tlen) for v in needles]
    # One hash per needle — PLUS the other-signed-zero encoding for
    # FLOAT/DOUBLE needles equal to 0.0: +0.0 and -0.0 compare equal
    # (so the exact downstream filter keeps either) but PLAIN-encode
    # to different bytes, and a file written with -0.0 must not be
    # proven 'absent' by a +0.0 needle (the writer twin already
    # inserts both variants; the probe must mirror it to honor the
    # no-false-negative contract on foreign parquet-mr/Spark files
    # too, which store whichever sign the data had).
    hash_alts: list[list[int]] = []
    for v, e in zip(needles, enc_needles):
        hs = [xxhash64(e)]
        if ptype in (_FLOAT, _DOUBLE) and v == 0:
            alt = plain_encode(-float(v), ptype, tlen)
            if alt != e:
                hs.append(xxhash64(alt))
        hash_alts.append(hs)
    # exact-filter comparands: bytes for BYTE_ARRAY/FLBA, value as-is
    # for numerics (str needles compare against utf-8 decoded? no —
    # the raw readers return bytes for BYTE_ARRAY; compare on bytes)
    cmp_needles = {
        e if ptype in (_BYTE_ARRAY, _FLBA) else v
        for v, e in zip(needles, enc_needles)
    }
    out: dict[str, list] = {c: [] for c in columns}
    n_total = n_read = n_filtered = 0
    want = set(columns) | {key_col}
    for rg in meta.get(4, []):
        n_total += 1
        md = None
        for cc in rg.get(1, []):
            m = cc.get(3)
            if m is None:
                continue
            if ".".join(p.decode("utf-8") for p in m.get(3, [])) == key_col:
                md = m
                break
        keep = True
        cand = list(range(len(needles)))
        if md is not None:
            if md.get(14) is not None:
                n_filtered += 1
            stats = md.get(12, {})
            mn = decode_stat_value(stats.get(6), md.get(1))
            mx = decode_stat_value(stats.get(5), md.get(1))
            if mn is not None and mx is not None:
                if ptype in (_BYTE_ARRAY, _FLBA):
                    cand = [
                        i for i in cand if mn <= enc_needles[i] <= mx
                    ]
                else:
                    cand = [i for i in cand if mn <= needles[i] <= mx]
                keep = bool(cand)
            if keep:
                bitset = read_bloom_filter(buf, md)
                if bitset is not None:
                    keep = any(
                        sbbf_contains(bitset, h)
                        for i in cand
                        for h in hash_alts[i]
                    )
        if not keep:
            continue
        n_read += 1
        group: dict[str, list] = {c: [] for c in want}
        _decode_row_group(buf, rg, schema, sorted(want), group)
        for r, kv in enumerate(group[key_col]):
            if kv in cmp_needles:
                for c in columns:
                    out[c].append(group[c][r])
    return out, n_read, n_total, n_filtered


def read_parquet_bloom_pruned_columns(
    path: str, columns: list[str], key_col: str, needles: list
) -> tuple[dict[str, list], int, int, int]:
    """:func:`read_parquet_bloom_pruned_bytes` over a file path."""
    with open(path, "rb") as f:
        return read_parquet_bloom_pruned_bytes(
            f.read(), columns, key_col, needles
        )
