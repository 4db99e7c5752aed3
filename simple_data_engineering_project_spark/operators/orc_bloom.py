"""ORC bloom filters — the READ side (round 14).

The ORC twin of :mod:`parquet_bloom`, completing the same
I/O-elimination rung in the second pure format: a point-lookup whose
needle keys sit inside every stripe's [min, max] defeats the stripe
statistics, and ORC's per-row-group bloom filters (stream kind 8,
``BLOOM_FILTER_UTF8``, in each stripe's index region) are the
structure the format provides for it. Each filter is one entry of a
``BloomFilterIndex`` protobuf (one ``BloomFilter`` per row group:
``numHashFunctions`` + the ``utf8bitset`` bytes = little-endian
uint64 words). Membership uses Java-style double hashing: a 64-bit
value hash (Thomas Wang's 64-bit mix for integer columns; the Apache
ORC Murmur3 64-bit variant with seed 104729 over utf-8 bytes for
strings), split into two signed 32-bit halves h1/h2, probing bit
``(h1 + i*h2) mod num_bits`` (Java int overflow + ``~x`` on negative)
for i in 1..k. A missed bit proves the key absent from the row group;
a stripe whose every row group proves every needle absent is skipped
without touching a data byte.

In-container honesty basis: pyarrow's ORC reader exposes no bloom
surface and DuckDB does not read ORC at all, but Spark's JVM writer
emits the filters (``orc.bloom.filter.columns``), so — exactly like
the parquet twin — the decode path is graded on Spark-written files
with a no-false-negative sweep over every present key of every
written row group (a single wrong constant in either hash or the
probe order fails thousands of those), plus pinned skip counts and
the truncation/bit-flip battery. The stats-trust contract matches
every other pruning scan here: filter bytes are trusted as written
(corruption may drop stripes, never fabricate rows — the exact
key-set row filter runs downstream), and stripes whose filters are
absent or undecodable read conservatively.

Reference behavior source: the public ORC spec (orc_proto.proto
BloomFilterIndex; the spec's bloom filter documentation) and the
reference repo's delegated point-lookup shape (dag.py:159) — same
citation basis as parquet_bloom.py.
"""
from __future__ import annotations

import struct

_M64 = (1 << 64) - 1

# Apache ORC Murmur3 constants (64-bit variant)
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
_ORC_SEED = 104729  # org.apache.orc.util.Murmur3.DEFAULT_SEED

# stream kinds (orc_proto Stream.Kind)
_S_BLOOM = 7
_S_BLOOM_UTF8 = 8


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix64(h: int) -> int:
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & _M64
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & _M64
    h ^= h >> 33
    return h


def murmur3_hash64(data: bytes, seed: int = _ORC_SEED) -> int:
    """Apache ORC's Murmur3 64-bit variant (Murmur3.hash64): 8-byte
    little-endian blocks mixed with the x64_128 constants into ONE
    lane, tail bytes joined UNSIGNED little-endian into the low end
    of k1, length xor, fmix64 finalization. Returns the unsigned
    64-bit value; callers split signed halves. Pinned empirically by
    the no-false-negative sweep over Spark-written filters with
    non-ASCII keys in every length-mod-8 class
    (tests/test_orc_bloom.py) — the sign-extending tail variant
    fails 71% of those probes."""
    n = len(data)
    h = seed & _M64
    nblocks = n >> 3
    for i in range(nblocks):
        k = int.from_bytes(data[8 * i : 8 * i + 8], "little")
        k = (k * _C1) & _M64
        k = _rotl64(k, 31)
        k = (k * _C2) & _M64
        h ^= k
        h = (_rotl64(h, 27) * 5 + 0x52DCE729) & _M64
    # tail: bytes join UNSIGNED (& 0xff), little-endian into the low
    # end of k1 — pinned empirically against Spark-written filters
    # with non-ASCII (high-bit) bytes in every length-mod-8 class
    # (0/5000 false negatives; the sign-extending variant fails 71%)
    tail = data[nblocks * 8 :]
    if tail:
        k1 = int.from_bytes(tail, "little")
        k1 = (k1 * _C1) & _M64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _M64
        h ^= k1
    h ^= n
    return _fmix64(h)


def _s64(v: int) -> int:
    """Truncate to Java's signed 64-bit long."""
    v &= _M64
    return v - (1 << 64) if v >= (1 << 63) else v


def wang_long_hash(v: int) -> int:
    """Thomas Wang's 64-bit integer mix — what ORC's BloomFilter uses
    for LONG/INT/SHORT/BYTE/DATE columns (BloomFilter.getLongHash).
    The shifts are Java's ARITHMETIC ``>>`` (sign-extending): Python's
    ``>>`` on negative ints matches, so the mix runs on signed values.
    The distinction only bites when an intermediate goes negative —
    v=0 turns into -1 at the first line and the logical-shift variant
    diverges exactly there (the empirical pin: key 0 was the single
    false negative out of 5000 before this)."""
    key = _s64(v)
    key = _s64(~key + (key << 21))
    key = _s64(key ^ (key >> 24))
    key = _s64(key + (key << 3) + (key << 8))
    key = _s64(key ^ (key >> 14))
    key = _s64(key + (key << 2) + (key << 4))
    key = _s64(key ^ (key >> 28))
    key = _s64(key + (key << 31))
    return key & _M64


def _s32(v: int) -> int:
    """Truncate to Java's signed 32-bit int."""
    v &= 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


def bloom_positions(hash64: int, k: int, num_bits: int):
    """The Java double-hash bit positions for one value: h1 =
    (int)hash64, h2 = (int)(hash64 >>> 32); position ``(h1 + i*h2)
    mod num_bits`` for i in 1..k, flipping negative combined hashes
    with ``~`` — 32-bit overflow semantics throughout. THE single
    source of probe math for both the read-side test and the write
    twin (:func:`orc_write._bloom_filter_pb`), so the two can never
    drift."""
    h1 = _s32(hash64)
    h2 = _s32(hash64 >> 32)
    for i in range(1, k + 1):
        combined = _s32(h1 + i * h2)
        if combined < 0:
            combined = ~combined
        yield combined % num_bits


def bloom_test(bitset: bytes, k: int, hash64: int) -> bool:
    """Probe one row group's bloom filter (``utf8bitset`` bytes =
    little-endian uint64 words, bit n at word n>>6 / bit n&63) via
    :func:`bloom_positions`. True = maybe present; False = PROVEN
    absent."""
    num_bits = len(bitset) * 8
    if num_bits == 0 or k <= 0:
        return True  # degenerate: conservative
    words = struct.unpack(f"<{len(bitset) >> 3}Q", bitset)
    for pos in bloom_positions(hash64, k, num_bits):
        if not (words[pos >> 6] >> (pos & 63)) & 1:
            return False
    return True


def read_stripe_bloom_filters(
    buf: bytes, stripe: dict, codec: int, col_id: int, decode: bool = True
) -> tuple[bool, list[tuple[int, bytes]] | None]:
    """Locate (and with ``decode=True`` parse) one stripe's
    ``BloomFilterIndex`` for ``col_id``. Returns ``(declared,
    filters)``: ``declared`` is the footer-only presence verdict (the
    stream list names a bloom stream for the column — the honesty
    counter's input, mirroring the parquet twin's ColumnMetaData
    field-14 presence check, and available without touching an index
    byte via ``decode=False`` for stripes the zone maps already
    eliminated); ``filters`` is ``[(num_hash_functions, bitset
    bytes)]`` — one entry per row group — or None when the stream is
    absent, not requested, or undecodable (the caller reads
    conservatively). Prefers the UTF8 stream (kind 8, ORC-135 — what
    current writers emit) over kind 7, whose old fixed64-bitset form
    used Java's broken per-encoding string hash and is not probed
    (it decodes to None → conservative read, with ``declared`` still
    True — same contract as a parquet chunk whose declared filter
    fails to decode)."""
    from .orc_data import _as_list, _decompress_stream, _pb_map

    offset = stripe.get(1, 0)
    streams_end = offset + stripe.get(2, 0) + stripe.get(3, 0)
    sf_raw = buf[streams_end:][: stripe.get(4, 0)]
    # two separate failure domains (round-14 review): a stripe footer
    # that won't parse means nothing is declared, but a DECLARED
    # stream whose index blob then fails to decode must keep
    # declared=True — the honesty counter counts declarations, same
    # as the parquet twin's field-14 presence check
    try:
        sf = _pb_map(_decompress_stream(codec, sf_raw))
        pos = offset
        blob = None
        declared = False
        for s_raw in _as_list(sf.get(1)):
            s = _pb_map(s_raw)
            kind, col, ln = s.get(1, 0), s.get(2, 0), s.get(3, 0)
            if col == col_id and kind in (_S_BLOOM, _S_BLOOM_UTF8):
                declared = True
                if kind == _S_BLOOM_UTF8 or blob is None:
                    blob = buf[pos : pos + ln]
            pos += ln
    except (ValueError, IndexError, struct.error):
        return False, None  # undecodable stripe footer: conservative
    if not decode or blob is None:
        return declared, None
    try:
        idx = _pb_map(_decompress_stream(codec, blob))
        out: list[tuple[int, bytes]] = []
        for bf_raw in _as_list(idx.get(1)):
            bf = _pb_map(bf_raw)
            k = bf.get(1, 0)
            bits = bf.get(3)
            if not isinstance(k, int) or not isinstance(
                bits, (bytes, bytearray)
            ) or len(bits) % 8:
                return declared, None  # fixed64-form/malformed
            out.append((k, bytes(bits)))
        return declared, (out or None)
    except (ValueError, IndexError, struct.error):
        return declared, None  # undecodable index blob: conservative


def read_orc_bloom_pruned_bytes(
    buf: bytes,
    columns: list[str],
    key_col: str,
    needles: list,
) -> tuple[dict[str, list], int, int, int]:
    """Point-lookup scan with BLOOM-FILTER stripe skipping: a stripe
    is decoded only if its statistics admit a needle AND at least one
    of its row groups' filters admits at least one needle (a stripe
    with no usable filter reads conservatively). Returns ``(columns
    dict, stripes_decoded, stripes_total, stripes_filtered)`` where
    ``stripes_filtered`` counts stripes whose stream list DECLARES a
    bloom stream for the key column (footer-only, same semantics as
    the parquet twin's ColumnMetaData field-14 presence count — a
    declared-but-undecodable filter still counts, and still reads
    conservatively).
    Surviving rows pass the exact ``key in needles`` filter, so
    probe admissions (including false positives) never surface a
    wrong row. The ORC twin of
    :func:`parquet_bloom.read_parquet_bloom_pruned_bytes` — stripe
    granularity here (multi-file layouts skip whole files' stripes);
    ROW_INDEX-position row-group seeking inside kept stripes is the
    finer sibling this reader does not implement."""
    from .orc_data import (
        _K_BYTE,
        _K_DATE,
        _K_INT,
        _K_LONG,
        _K_SHORT,
        _K_STRING,
        _K_VARCHAR,
        _K_CHAR,
        _leaf_columns,
        _parse_tail,
        read_orc_nested_columns,
        read_stripe_stats,
    )

    codec, _footer, types, stripes = _parse_tail(buf)
    leaves = _leaf_columns(types)
    if key_col not in leaves:
        raise ValueError(f"column {key_col!r} not in file")
    cid = leaves[key_col]["col_id"]
    kind = leaves[key_col]["kind"]
    if kind in (_K_LONG, _K_INT, _K_SHORT, _K_BYTE, _K_DATE):
        stat_vals = [int(v) for v in needles]
        hashes = [wang_long_hash(v) for v in stat_vals]
        cmp_needles = set(stat_vals)
    elif kind in (_K_STRING, _K_VARCHAR, _K_CHAR):
        stat_vals, hashes = [], []
        for v in needles:
            e = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            try:
                s = e.decode("utf-8")
            except UnicodeDecodeError:
                # ORC strings are utf-8 by spec: a non-decodable bytes
                # needle cannot equal any value — drop it instead of
                # crashing the stats comparison (round-14 review)
                continue
            stat_vals.append(s)
            hashes.append(murmur3_hash64(e))
        cmp_needles = set(stat_vals)
    else:
        raise NotImplementedError(
            f"ORC bloom probe for column kind {kind} not supported"
        )
    stats = read_stripe_stats(buf)
    keep: list[bool] = []
    n_filtered = 0
    for i, st in enumerate(stripes):
        cand = list(range(len(stat_vals)))
        if i < len(stats) and cid < len(stats[i]):
            mn, mx = stats[i][cid]["min"], stats[i][cid]["max"]
            if mn is not None and mx is not None:
                cand = [j for j in cand if mn <= stat_vals[j] <= mx]
        # one stripe-footer parse serves both the presence counter and
        # (for zone-survivors) the filter decode; zone-eliminated
        # stripes skip the index bytes entirely (decode=False)
        declared, filters = read_stripe_bloom_filters(
            buf, st, codec, cid, decode=bool(cand)
        )
        if declared:
            n_filtered += 1
        if not cand:
            keep.append(False)
            continue
        if filters is None:
            keep.append(True)  # no/undecodable filter: conservative
            continue
        keep.append(
            any(
                bloom_test(bits, k, hashes[j])
                for k, bits in filters
                for j in cand
            )
        )
    out: dict[str, list] = {c: [] for c in columns}
    if any(keep):
        want = list(dict.fromkeys([*columns, key_col]))
        data = read_orc_nested_columns(buf, want, _keep=keep)
        for r, kv in enumerate(data[key_col]):
            if kv in cmp_needles:
                for c in columns:
                    out[c].append(data[c][r])
    return out, sum(keep), len(keep), n_filtered


def read_orc_bloom_pruned_columns(
    path: str, columns: list[str], key_col: str, needles: list
) -> tuple[dict[str, list], int, int, int]:
    """:func:`read_orc_bloom_pruned_bytes` over a file path."""
    with open(path, "rb") as f:
        return read_orc_bloom_pruned_bytes(
            f.read(), columns, key_col, needles
        )
