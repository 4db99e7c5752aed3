"""Brotli decoder pins: pyarrow's bundled brotli (the reference
implementation) validates every path — randomized compress→decode
fuzz across quality levels and payload shapes, the static dictionary
and context tables extracted from the reference library, the
121-transform table re-DERIVED from the reference decoder's observable
behavior on hand-built streams, parquet brotli pages end-to-end, and
truncation/bit-flip robustness sweeps."""

from __future__ import annotations

import io
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import simple_data_engineering_project_spark.operators.brotli as B
from simple_data_engineering_project_spark.operators.brotli import (
    brotli_decompress,
)


def test_reference_blobs_extract_and_pin():
    B._load_reference_blobs()
    assert len(B._dictionary) == 122784
    assert len(B._context_lut) == 2048
    # spec-derived invariants: the length-4 section leads with the
    # known words; LSB6/MSB6 context sections are their closed forms
    assert B._dictionary[:8] == b"timedown"
    assert B._context_lut[:256] == bytes(i & 0x3F for i in range(256))
    assert B._context_lut[512:768] == bytes(i >> 2 for i in range(256))
    assert B._context_lut[256:512] == bytes(256)  # LSB6 lut1
    # section offsets sum to the full dictionary
    assert B._DOFFSET[24] + 24 * (1 << B._NDBITS[24]) == 122784


@pytest.mark.parametrize("q", [0, 1, 2, 5, 9, 11])
def test_fuzz_vs_reference(q):
    c = pa.Codec("brotli", compression_level=q)
    rnd = random.Random(1000 + q)
    words = ["the", "of", "and", "data", "hello", "world", "about",
             "information", "Übung", "naïve", "日本語テキスト"]
    payloads = [
        b"", b"x", b"hello world", b"a" * 38,
        bytes(range(256)) * 40,
        (" ".join(rnd.choice(words) for _ in range(5000))).encode(),
        os.urandom(20000),
        (b"abcdefgh" * 3 + os.urandom(5)) * 1000,
        bytes(50000),
    ]
    for _ in range(20):
        kind = rnd.randrange(3)
        if kind == 0:
            payloads.append(
                (" ".join(rnd.choice(words)
                          for _ in range(rnd.randrange(0, 500)))).encode()
            )
        elif kind == 1:
            payloads.append(os.urandom(rnd.randrange(0, 4000)))
        else:
            unit = bytes(rnd.randrange(256)
                         for _ in range(rnd.randrange(1, 20)))
            payloads.append(unit * rnd.randrange(1, 400))
    for t in payloads:
        comp = bytes(c.compress(t))
        assert brotli_decompress(comp, len(t)) == t


def _bw():
    class BW:
        def __init__(self):
            self.bits = []

        def w(self, v, n):
            for k in range(n):
                self.bits.append((v >> k) & 1)

        def bytes(self):
            out = bytearray()
            for i in range(0, len(self.bits), 8):
                b = 0
                for k, bit in enumerate(self.bits[i: i + 8]):
                    b |= bit << k
                out.append(b)
            return bytes(out)

    return BW()


_CPY = [(2, 0), (3, 0), (4, 0), (5, 0), (6, 0), (7, 0), (8, 0), (9, 0),
        (10, 1), (12, 1), (14, 2), (18, 2), (22, 3), (30, 3), (38, 4),
        (54, 4), (70, 5), (102, 5), (134, 6), (198, 7)]


def _dict_ref_stream(mlen: int, copy_len: int, address: int) -> bytes:
    """Hand-built single-meta-block stream: zero literals, one static
    dictionary reference of ``copy_len`` at ``address`` (position 0,
    so distance = address + 1)."""
    bw = _bw()
    bw.w(0, 1)            # WBITS=16
    bw.w(1, 1)            # ISLAST
    bw.w(0, 1)            # ISLASTEMPTY
    bw.w(0, 2)            # MNIBBLES -> 4
    bw.w(mlen - 1, 16)    # MLEN
    bw.w(0, 1); bw.w(0, 1); bw.w(0, 1)   # NBLTYPES L/I/D = 1
    bw.w(0, 2); bw.w(0, 4)               # NPOSTFIX, NDIRECT
    bw.w(0, 2)                           # context mode LSB6
    bw.w(0, 1); bw.w(0, 1)               # NTREESL/NTREESD = 1
    bw.w(1, 2); bw.w(0, 2); bw.w(0, 8)   # literal: simple 1-symbol
    c_code = next(
        i for i, (off, e) in enumerate(_CPY)
        if off <= copy_len < off + (1 << e)
    )
    off, e = _CPY[c_code]
    cmd = 128 + c_code if c_code < 8 else 192 + (c_code - 8)
    bw.w(1, 2); bw.w(0, 2); bw.w(cmd, 10)  # insert&copy: simple 1-sym
    dist = address + 1
    sym = None
    for hcode in range(48):
        nd = 1 + (hcode >> 1)
        offs = ((2 + (hcode & 1)) << nd) - 4
        if offs + 1 <= dist <= offs + (1 << nd):
            sym, extra, ndb = 16 + hcode, dist - offs - 1, nd
            break
    assert sym is not None
    bw.w(1, 2); bw.w(0, 2); bw.w(sym, 6)   # distance: simple 1-sym
    bw.w(copy_len - off, e)                # copy extra bits
    bw.w(extra, ndb)                       # distance extra bits
    return bw.bytes()


def _reference_decode(stream: bytes, max_out: int = 64) -> bytes | None:
    c = pa.Codec("brotli")
    for n in range(1, max_out):
        try:
            return bytes(c.decompress(stream, n))
        except Exception:
            continue
    return None


def test_transform_table_matches_reference():
    """Re-derive the 121-transform table from the reference decoder:
    for every transform id, a hand-built stream selecting it on a
    12-letter dictionary word is decoded by pyarrow's brotli, and the
    output must equal this module's _apply_transform. Rows whose
    output would be impossible to express (empty streams) cannot occur
    with a 12-letter word, so every row is exercised."""
    B._load_reference_blobs()
    length = 12
    widx = 3
    word = B._dictionary[
        B._DOFFSET[length] + widx * length:
        B._DOFFSET[length] + (widx + 1) * length
    ]
    ndbits = B._NDBITS[length]
    for tid in range(121):
        address = (tid << ndbits) | widx
        got = None
        for mlen in range(1, 41):
            r = _reference_decode(_dict_ref_stream(mlen, length, address))
            if r is not None and len(r) == mlen:
                got = r
                break
        assert got is not None, f"reference rejects transform {tid}"
        assert got == B._apply_transform(word, tid), tid
        # the decoder end-to-end agrees with the reference too
        assert brotli_decompress(
            _dict_ref_stream(len(got), length, address), len(got)
        ) == got


def test_parquet_brotli_pages_end_to_end():
    from simple_data_engineering_project_spark.operators.parquet_data import (
        read_parquet_bytes,
        read_parquet_nested_bytes,
    )

    rnd = random.Random(3)
    n = 8000
    t = pa.table({
        "i": pa.array(
            [rnd.randint(-10**12, 10**12) if rnd.random() > 0.1
             else None for _ in range(n)], pa.int64()),
        "s": pa.array(
            [None if rnd.random() < 0.1 else f"w{rnd.randrange(50)}"
             for _ in range(n)]),
        "d": pa.array([rnd.uniform(-1e9, 1e9) for _ in range(n)],
                      pa.float64()),
        "l": pa.array(
            [None if rnd.random() < 0.1 else
             [rnd.randrange(100) for _ in range(rnd.randrange(4))]
             for _ in range(n)], pa.list_(pa.int64())),
    })
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="brotli", row_group_size=3000)
    blob = buf.getvalue()
    got = read_parquet_bytes(blob, ["i", "s", "d"])
    assert got["i"] == t.column("i").to_pylist()
    assert [None if v is None else v.decode() for v in got["s"]] == \
        t.column("s").to_pylist()
    assert got["d"] == t.column("d").to_pylist()
    assert read_parquet_nested_bytes(blob, ["l"])["l"] == \
        t.column("l").to_pylist()


def test_truncation_and_bitflips_never_hang():
    c = pa.Codec("brotli")
    base = (b"the quick brown fox " * 200) + os.urandom(300)
    comp = bytes(c.compress(base))
    assert brotli_decompress(comp, len(base)) == base
    for cut in (1, len(comp) // 3, len(comp) - 2):
        with pytest.raises(Exception):
            brotli_decompress(comp[:cut], len(base))
    rnd = random.Random(11)
    for _ in range(120):
        mut = bytearray(comp)
        mut[rnd.randrange(len(mut))] ^= 1 << rnd.randrange(8)
        try:
            got = brotli_decompress(bytes(mut), len(base))
            assert len(got) == len(base)  # declared size enforced
        except Exception as exc:
            assert not isinstance(exc, (SystemExit, KeyboardInterrupt))


def test_output_size_bomb_guard():
    c = pa.Codec("brotli")
    big = bytes(1_000_000)
    comp = bytes(c.compress(big))
    with pytest.raises(ValueError, match="exceeds|!="):
        brotli_decompress(comp, 1000)  # declared far smaller


def test_metadata_skip_blocks_and_uncompressed():
    """Hand-built stream: a metadata skip block (encoders never emit
    one), then an uncompressed meta-block, then a final empty block —
    all three spec forms the compress-based fuzz can't reach."""
    payload = b"hello metadata"
    meta = b"\xde\xad\xbe\xef"
    bw = _bw()
    bw.w(0, 1)               # WBITS=16
    # metadata block: ISLAST=0, MNIBBLES code 3, reserved 0,
    # MSKIPBYTES=1, skip length byte (len-1), align, bytes
    bw.w(0, 1)
    bw.w(3, 2)
    bw.w(0, 1)
    bw.w(1, 2)
    bw.w(len(meta) - 1, 8)
    while len(bw.bits) % 8:
        bw.w(0, 1)
    for b in meta:
        bw.w(b, 8)
    # uncompressed meta-block: ISLAST=0, MNIBBLES->4, MLEN,
    # ISUNCOMPRESSED=1, align, raw bytes
    bw.w(0, 1)
    bw.w(0, 2)
    bw.w(len(payload) - 1, 16)
    bw.w(1, 1)
    while len(bw.bits) % 8:
        bw.w(0, 1)
    for b in payload:
        bw.w(b, 8)
    # final empty block
    bw.w(1, 1)
    bw.w(1, 1)
    stream = bw.bytes()
    # the reference decoder agrees the stream is valid and means this
    assert _reference_decode(stream, 64) == payload
    assert brotli_decompress(stream, len(payload)) == payload


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_encoder_streams_validate_against_reference_decoder(seed):
    """Every stream brotli_compress emits must decode through
    pyarrow's reference brotli (values AND stream validity), plus the
    sibling decoder — text, binary, constant, few-symbol, empty,
    multi-chunk (>4 MiB), and store-path payloads."""
    from simple_data_engineering_project_spark.operators.brotli import (
        brotli_compress,
    )

    c = pa.Codec("brotli")
    rnd = random.Random(seed)
    payloads = [
        b"", b"x", b"hello world", b"a" * 1000,
        bytes(range(256)) * 50,
        os.urandom(60000),             # store path
        open("/root/repo/SURVEY.md", "rb").read(),
    ]
    if seed == 1:
        payloads.append(os.urandom(5_000_000))  # two chunks
    for _ in range(40):
        k = rnd.randrange(4)
        if k == 0:
            payloads.append(
                bytes(rnd.randrange(256)
                      for _ in range(rnd.randrange(2000))))
        elif k == 1:
            payloads.append(
                bytes([rnd.randrange(6)]) * rnd.randrange(1, 500))
        elif k == 2:
            payloads.append(
                (" ".join(str(rnd.randrange(100))
                          for _ in range(rnd.randrange(300)))).encode())
        else:
            payloads.append(
                bytes(rnd.choice(b"ABCDEFG")
                      for _ in range(rnd.randrange(1000))))
    for t in payloads:
        enc = brotli_compress(t)
        assert bytes(c.decompress(enc, len(t))) == t
        assert brotli_decompress(enc, len(t)) == t


def test_encoder_compresses_text():
    from simple_data_engineering_project_spark.operators.brotli import (
        brotli_compress,
    )

    text = open("/root/repo/SURVEY.md", "rb").read()
    assert len(brotli_compress(text)) < 0.75 * len(text)


def test_parquet_brotli_write_read():
    """Pure writer with compression=brotli: pyarrow (reference) reads
    values AND the declared BROTLI codec; the own reader round-trips;
    both page versions."""
    from simple_data_engineering_project_spark.operators.parquet_data import (
        read_parquet_bytes,
    )
    from simple_data_engineering_project_spark.operators.parquet_write import (
        build_parquet_bytes,
    )

    rnd = random.Random(2)
    n = 3000
    cols = {
        "i": [rnd.randint(-10**9, 10**9) if rnd.random() > 0.1
              else None for _ in range(n)],
        "s": [None if rnd.random() < 0.1
              else f"w{rnd.randrange(500)}" for _ in range(n)],
        "d": [rnd.uniform(-1e6, 1e6) for _ in range(n)],
        "m": [None if i % 7 == 0
              else {f"k{j}": i * 10 + j for j in range(i % 3)}
              for i in range(n)],
    }
    ddl = {"i": "bigint", "s": "string", "d": "double",
           "m": "map<string,bigint>"}
    for pv in (1, 2):
        blob = build_parquet_bytes(
            cols, ddl, "brotli", row_group_size=1000, page_version=pv
        )
        pf = pq.ParquetFile(io.BytesIO(blob))
        assert pf.metadata.row_group(0).column(0).compression == "BROTLI"
        t = pf.read()
        assert t.column("i").to_pylist() == cols["i"]
        assert t.column("s").to_pylist() == cols["s"]
        assert t.column("d").to_pylist() == cols["d"]
        assert [
            None if m is None else dict(m)
            for m in t.column("m").to_pylist()
        ] == cols["m"]
        own = read_parquet_bytes(blob, ["i", "d"])
        assert own["i"] == cols["i"] and own["d"] == cols["d"]


def test_encoder_simple_code_orderings():
    """2/3/4-distinct-symbol payloads exercise the simple prefix-code
    forms whose symbol-ordering conventions the reference decoder
    arbitrates (sorted pairs, length-1-first triples, flat quads)."""
    from simple_data_engineering_project_spark.operators.brotli import (
        brotli_compress,
    )

    c = pa.Codec("brotli")
    rnd = random.Random(9)
    for distinct in (2, 3, 4):
        for _ in range(15):
            alpha = rnd.sample(range(256), distinct)
            t = bytes(rnd.choices(
                alpha, weights=[10**i for i in range(distinct)],
                k=rnd.randrange(distinct, 400)))
            if len(set(t)) != distinct:
                continue
            enc = brotli_compress(t)
            assert bytes(c.decompress(enc, len(t))) == t
            assert brotli_decompress(enc, len(t)) == t


def test_npostfix_ndirect_distances_vs_reference():
    """pyarrow's encoder rarely (if ever) emits NPOSTFIX/NDIRECT > 0,
    so the parameterized distance formula is arbitrated with
    hand-built streams decoded by the reference decoder: one direct
    code (dist = code-16+1) and one long-form code under NPOSTFIX=2
    with low bits spliced back in."""
    c = pa.Codec("brotli")

    def build_direct():
        bw = _bw()
        bw.w(0, 1); bw.w(1, 1); bw.w(0, 1)
        bw.w(0, 2); bw.w(6 - 1, 16)      # MLEN 6 = 2 lits + copy 4
        bw.w(0, 1); bw.w(0, 1); bw.w(0, 1)
        bw.w(2, 2); bw.w(8, 4)           # NPOSTFIX=2, NDIRECT raw 8
        bw.w(0, 2); bw.w(0, 1); bw.w(0, 1)
        bw.w(1, 2); bw.w(1, 2); bw.w(ord("a"), 8); bw.w(ord("b"), 8)
        bw.w(1, 2); bw.w(0, 2); bw.w(128 + (2 << 3) + 2, 10)
        alpha = 16 + (8 << 2) + (48 << 2)
        abits = (alpha - 1).bit_length()
        bw.w(1, 2); bw.w(0, 2); bw.w(16 + 1, abits)  # direct: dist 2
        # data: literals a,b (1-bit codes) then no distance extra
        bw.bits.append(0); bw.bits.append(1)
        return bw.bytes()

    def build_long():
        bw = _bw()
        bw.w(0, 1); bw.w(1, 1); bw.w(0, 1)
        bw.w(0, 2); bw.w(54 - 1, 16)     # 50 lits + copy 4
        bw.w(0, 1); bw.w(0, 1); bw.w(0, 1)
        bw.w(2, 2); bw.w(0, 4)           # NPOSTFIX=2, NDIRECT 0
        bw.w(0, 2); bw.w(0, 1); bw.w(0, 1)
        bw.w(1, 2); bw.w(1, 2); bw.w(ord("a"), 8); bw.w(ord("b"), 8)
        # insert code 13 (offset 50, 4 extra bits), copy code 2
        bw.w(1, 2); bw.w(0, 2); bw.w(256 + ((13 - 8) << 3) + 2, 10)
        alpha = 16 + (48 << 2)
        abits = (alpha - 1).bit_length()
        # hcode=1, lcode=3: ndistbits 1, offset 2; extra 1 ->
        # dist = ((2+1)<<2)+3+0+1 = 16
        bw.w(1, 2); bw.w(0, 2); bw.w(16 + ((1 << 2) | 3), abits)
        bw.w(0, 4)                        # insert extra
        for ch in b"ab" * 25:
            bw.bits.append(0 if ch == ord("a") else 1)
        bw.w(1, 1)                        # distance extra bit
        return bw.bytes()

    for stream in (build_direct(), build_long()):
        ref = _reference_decode(stream, 80)
        assert ref is not None
        assert brotli_decompress(stream, len(ref)) == ref


def test_encoder_distance_ring_persists_across_meta_blocks():
    """Regression: the encoder's simulated distance ring must persist
    across 4 MiB meta-blocks (RFC 7932 §4 — the decoder's ring does).
    A >4 MiB COMPRESSIBLE payload whose second chunk begins with a
    distance-4 repeat: the pre-fix per-chunk ring reset made the
    encoder emit an implicit last-distance cell that the decoder
    resolved against the chunk-1 ring head (distance 1000 here),
    silently corrupting the output. Validated against pyarrow's
    reference decoder AND the sibling decoder; also asserts both
    chunks actually took the compressed (non-store) path."""
    from simple_data_engineering_project_spark.operators.brotli import (
        brotli_compress,
    )

    rnd = random.Random(7)
    chunk_len = 1 << 22
    # chunk 1: matches at distance 1000 -> pushes 1000 into the ring
    block = bytes(
        rnd.choice(b"abcdefghijklmnopqrstuvwxyz ") for _ in range(1000)
    )
    chunk1 = (block * ((chunk_len // 1000) + 1))[:chunk_len]
    # chunk 2: begins with a distance-4 repeat
    chunk2 = b"wxyz" * 7 + block * 200
    data = chunk1 + chunk2
    assert len(data) > chunk_len
    enc = brotli_compress(data)
    # both chunks compressed (not store): far below the raw size
    assert len(enc) < len(data) // 100
    c = pa.Codec("brotli")
    assert bytes(c.decompress(enc, len(data))) == data
    assert brotli_decompress(enc, len(data)) == data


def test_encoder_ring_rollback_on_store_chunk():
    """A compressible chunk 1 (pushes distances) followed by an
    incompressible store-path chunk 2 and a compressible chunk 3 that
    opens with a short-distance repeat: the simulated ring must carry
    chunk 1's pushes THROUGH the store chunk (which leaves the
    decoder's ring untouched) without also absorbing chunk 2's
    planning-time mutations."""
    from simple_data_engineering_project_spark.operators.brotli import (
        brotli_compress,
    )

    rnd = random.Random(11)
    chunk_len = 1 << 22
    block = bytes(
        rnd.choice(b"abcdefghijklmnopqrstuvwxyz ") for _ in range(777)
    )
    chunk1 = (block * ((chunk_len // 777) + 1))[:chunk_len]
    chunk2 = os.urandom(chunk_len)  # store path
    chunk3 = b"wxyz" * 7 + block * 50
    data = chunk1 + chunk2 + chunk3
    enc = brotli_compress(data)
    c = pa.Codec("brotli")
    assert bytes(c.decompress(enc, len(data))) == data
    assert brotli_decompress(enc, len(data)) == data
