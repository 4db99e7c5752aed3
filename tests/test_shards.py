"""Tar/WebDataset shard pins: stdlib cross-validation both directions,
block-boundary sizes, grouping rules, envelope raises."""

from __future__ import annotations

import io
import tarfile

import pytest

from simple_data_engineering_project_spark.operators.shards import (
    encode_tar,
    group_webdataset,
    parse_tar,
)

MEMBERS = [
    ("000/0001.txt", b"hello"),
    ("000/0001.json", b'{"a":1}'),
    ("000/0001.seg.png", b"\x89PNG fake"),
    ("000/0002.txt", b"x" * 600),
]


def test_cross_validated_against_stdlib_tarfile():
    # our archives must read back with tarfile, and tarfile archives
    # with our walker — so the pair is NOT merely self-consistent
    p = encode_tar(MEMBERS)
    tf = tarfile.open(fileobj=io.BytesIO(p))
    assert [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()] == MEMBERS
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as w:
        for n, d in MEMBERS:
            ti = tarfile.TarInfo(n)
            ti.size = len(d)
            w.addfile(ti, io.BytesIO(d))
    assert parse_tar(buf.getvalue()) == MEMBERS


def test_block_boundary_sizes_and_gzip():
    # sizes at and around the 512 block boundary exercise padding math
    edge = [(f"{n}.bin", b"z" * n) for n in (0, 1, 511, 512, 513, 1024)]
    assert parse_tar(encode_tar(edge)) == edge
    assert parse_tar(encode_tar(edge, gzipped=True)) == edge


def test_tar_zst_by_magic():
    # .tar.zst shards: zstd sniffed by magic; the compressor is
    # pyarrow's bundled reference encoder, the decoder is ours
    # (operators/zstd.py) — a cross-implementation pair, and the CLI
    # form decodes too when available
    import shutil
    import subprocess

    import pyarrow as pa

    edge = [(f"{n}.bin", bytes(range(256)) * n) for n in (0, 1, 3, 9)]
    raw = encode_tar(edge)
    assert parse_tar(pa.Codec("zstd").compress(raw, asbytes=True)) == edge
    if shutil.which("zstd"):
        p = subprocess.run(
            ["zstd", "-9", "-c"], input=raw, capture_output=True
        )
        assert p.returncode == 0
        assert parse_tar(p.stdout) == edge


def test_zip_zstd_members():
    # method 93 (Zstandard) members: written with the pyarrow reference
    # encoder, read back through operators/zstd.py with the central
    # directory's CRC-32 verified over the decompressed bytes
    from simple_data_engineering_project_spark.operators.zipshard import (
        encode_zip,
        parse_zip,
    )

    members = [
        ("a.txt", b"alpha " * 500),
        ("b.bin", bytes(range(256)) * 40),
        ("empty", b""),
    ]
    z = encode_zip(members, method=93)
    assert parse_zip(z) == members
    # zip64 layout composes with method 93
    z64 = encode_zip(members, method=93, zip64=True)
    assert parse_zip(z64) == members
    # CRC over the DECOMPRESSED bytes still gates: corrupt one byte of
    # the first member's compressed body (local header is 30 + name)
    broken = bytearray(z)
    broken[30 + len("a.txt") + 6] ^= 0x01
    try:
        got = parse_zip(bytes(broken))
        assert got != members  # must not silently equal
    except Exception:
        pass


def test_webdataset_stem_grouping():
    g = group_webdataset(parse_tar(encode_tar(MEMBERS)))
    assert g["000/0001"] == {
        "txt": b"hello",
        "json": b'{"a":1}',
        "seg.png": b"\x89PNG fake",  # extension = after FIRST dot
    }
    assert g["000/0002"] == {"txt": b"x" * 600}


def test_long_paths_gnu_and_pax_from_stdlib():
    # >100-char paths through BOTH real-world mechanisms, written by
    # stdlib tarfile — cross-validation, not self-consistency
    long_name = "deep/" * 30 + "x" * 60 + ".txt"
    members = [(long_name, b"long path data"), ("short.txt", b"s")]
    for fmt in (tarfile.GNU_FORMAT, tarfile.PAX_FORMAT):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=fmt) as w:
            for n, d in members:
                ti = tarfile.TarInfo(n)
                ti.size = len(d)
                w.addfile(ti, io.BytesIO(d))
        assert parse_tar(buf.getvalue()) == members
    # grouping still keys on the overridden long path
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.GNU_FORMAT) as w:
        for ext in ("txt", "cls"):
            n = "p/" * 60 + f"0001.{ext}"
            ti = tarfile.TarInfo(n)
            ti.size = 1
            w.addfile(ti, io.BytesIO(b"z"))
    g = group_webdataset(parse_tar(buf.getvalue()))
    assert set(g["p/" * 60 + "0001"]) == {"txt", "cls"}

def test_zip_cross_validation_both_directions():
    import io
    import zipfile

    from simple_data_engineering_project_spark.operators.zipshard import (
        encode_zip,
        parse_zip,
    )

    members = [
        ("0001.txt", b"hello world" * 20),
        ("0001.cls", b"7"),
        # marker lookalikes inside member bodies must not derail the walk
        ("sub/0001.json", b'{"id":1, "PK\x05\x06PK\x03\x04":"trap"}'),
    ]
    for method in (0, 8):
        blob = encode_zip(members, method=method)
        zf = zipfile.ZipFile(io.BytesIO(blob))
        assert zf.testzip() is None
        assert [(n, zf.read(n)) for n in zf.namelist()] == members
        assert parse_zip(blob) == members

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("a/", "")  # directory entry: skipped
        z.writestr(
            "a/x.txt",
            b"data PK\x03\x04 inside",
            compress_type=zipfile.ZIP_DEFLATED,
        )
        z.writestr(
            "y.bin", bytes(range(256)) * 4, compress_type=zipfile.ZIP_STORED
        )
        z.comment = b"trailing comment moves the EOCD scan"
    assert parse_zip(buf.getvalue()) == [
        ("a/x.txt", b"data PK\x03\x04 inside"),
        ("y.bin", bytes(range(256)) * 4),
    ]


def test_zip_envelope_and_corruption():
    import io
    import zipfile

    import pytest

    from simple_data_engineering_project_spark.operators.zipshard import (
        encode_zip,
        parse_zip,
    )

    # bzip2/lzma moved in-envelope; method 98 (ppmd) stays out — forge
    # it by patching the method field of a stored member
    blob98 = bytearray(encode_zip([("p.bin", b"x" * 40)], method=0))
    for sig in (b"PK\x03\x04", b"PK\x01\x02"):
        at = blob98.index(sig)
        off = 8 if sig == b"PK\x03\x04" else 10  # method field offset
        blob98[at + off : at + off + 2] = (98).to_bytes(2, "little")
    with pytest.raises(NotImplementedError, match="method"):
        parse_zip(bytes(blob98))

    blob = bytearray(encode_zip([("a.txt", b"payload bytes")], method=0))
    at = blob.index(b"payload bytes")
    blob[at] ^= 0xFF  # flip a stored byte -> CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        parse_zip(bytes(blob))
    with pytest.raises(ValueError, match="end-of-central"):
        parse_zip(b"not a zip at all")


def _build_zip64_archive(members):
    """Hand-construct a fully-sentineled zip64 archive: every member's
    central sizes/offset maxed into 0x0001 extras, EOCD64 record +
    locator, EOCD with all counts/offsets maxed. stdlib zipfile reads
    it too, so both parsers see the same bytes."""
    import struct
    import zlib

    out = bytearray()
    central = bytearray()
    for name, data in members:
        nb = name.encode()
        crc = zlib.crc32(data) & 0xFFFFFFFF
        loc_off = len(out)
        # local: sentinel sizes + zip64 extra (usize, csize)
        lextra = struct.pack("<HHQQ", 0x0001, 16, len(data), len(data))
        out += (
            b"PK\x03\x04"
            + struct.pack(
                "<HHHHHIII", 45, 0, 0, 0, 0x21, crc,
                0xFFFFFFFF, 0xFFFFFFFF,
            )
            + struct.pack("<HH", len(nb), len(lextra))
            + nb
            + lextra
            + data
        )
        cextra = struct.pack(
            "<HHQQQ", 0x0001, 24, len(data), len(data), loc_off
        )
        central += (
            b"PK\x01\x02"
            + struct.pack(
                "<HHHHHHIII", 45, 45, 0, 0, 0, 0x21, crc,
                0xFFFFFFFF, 0xFFFFFFFF,
            )
            + struct.pack(
                "<HHHHHII", len(nb), len(cextra), 0, 0, 0, 0, 0xFFFFFFFF
            )
            + nb
            + cextra
        )
    cd_off = len(out)
    out += central
    z64_at = len(out)
    out += b"PK\x06\x06" + struct.pack(
        "<QHHIIQQQQ", 44, 45, 45, 0, 0,
        len(members), len(members), len(central), cd_off,
    )
    out += b"PK\x06\x07" + struct.pack("<IQI", 0, z64_at, 1)
    out += b"PK\x05\x06" + struct.pack(
        "<HHHHIIH", 0, 0, 0xFFFF, 0xFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0
    )
    return bytes(out)


def test_zip64_fully_sentineled_archive():
    import io
    import zipfile

    from simple_data_engineering_project_spark.operators.zipshard import (
        parse_zip,
    )

    members = [
        ("big/0001.txt", b"payload " * 100),
        ("big/0001.cls", b"3"),
        ("PK\x05\x06trap.bin", bytes(range(256))),
    ]
    blob = _build_zip64_archive(members)
    # stdlib reads the same bytes — cross-validation, not self-consistency
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert [(n, zf.read(n)) for n in zf.namelist()] == members
    assert parse_zip(blob) == members


def test_zip64_many_members_eocd64_from_stdlib():
    # >65,535 members forces stdlib zipfile to write the EOCD64 record
    # + locator with the EOCD count maxed at 0xFFFF
    import io
    import zipfile

    from simple_data_engineering_project_spark.operators.zipshard import (
        parse_zip,
    )

    buf = io.BytesIO()
    n = 0xFFFF + 20
    with zipfile.ZipFile(buf, "w", allowZip64=True) as z:
        for i in range(n):
            z.writestr(f"m{i:05d}", b"")
    got = parse_zip(buf.getvalue())
    assert len(got) == n
    assert got[0] == ("m00000", b"") and got[-1] == (f"m{n-1:05d}", b"")


def test_zip64_forced_member_extra_from_stdlib():
    # stdlib force_zip64 writes zip64 local-header extras; the central
    # records stay authoritative — the member must still extract
    import io
    import zipfile

    from simple_data_engineering_project_spark.operators.zipshard import (
        parse_zip,
    )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", allowZip64=True) as z:
        with z.open("f.bin", "w", force_zip64=True) as f:
            f.write(b"forced " * 50)
        z.writestr("g.txt", "plain")
    assert parse_zip(buf.getvalue()) == [
        ("f.bin", b"forced " * 50),
        ("g.txt", b"plain"),
    ]


def test_zip_bzip2_and_lzma_members_from_stdlib():
    # methods 12 (bzip2) and 14 (zip-LZMA, re-framed to an ALONE
    # header for the stdlib decompressor) — written by stdlib zipfile
    import io
    import zipfile

    from simple_data_engineering_project_spark.operators.zipshard import (
        parse_zip,
    )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("b.txt", b"bzip body " * 40,
                   compress_type=zipfile.ZIP_BZIP2)
        z.writestr("l.txt", b"lzma body " * 40,
                   compress_type=zipfile.ZIP_LZMA)
        z.writestr("d.txt", b"deflate body",
                   compress_type=zipfile.ZIP_DEFLATED)
    assert parse_zip(buf.getvalue()) == [
        ("b.txt", b"bzip body " * 40),
        ("l.txt", b"lzma body " * 40),
        ("d.txt", b"deflate body"),
    ]


def test_encode_zip_zip64_layout_cross_validated():
    # the product encoder's zip64 mode: stdlib reads it, our parser
    # reads it, both stored and deflate
    import io
    import zipfile

    from simple_data_engineering_project_spark.operators.zipshard import (
        encode_zip,
        parse_zip,
    )

    members = [("a.txt", b"hello " * 50), ("b.cls", b"7")]
    for method in (0, 8):
        blob = encode_zip(members, method=method, zip64=True)
        zf = zipfile.ZipFile(io.BytesIO(blob))
        assert zf.testzip() is None
        assert [(n, zf.read(n)) for n in zf.namelist()] == members
        assert parse_zip(blob) == members


def test_gnu_base256_size_field():
    # >8 GiB members use base-256 sizes (high bit + big-endian binary);
    # forged onto a normal member with re-checksummed header
    from simple_data_engineering_project_spark.operators.shards import (
        encode_tar,
        parse_tar,
    )

    blob = bytearray(encode_tar([("b.bin", b"q" * 700)]))
    blob[124:136] = bytes([0x80]) + (700).to_bytes(11, "big")
    hdr = bytearray(blob[0:512])
    hdr[148:156] = b" " * 8
    blob[148:156] = f"{sum(hdr):06o}\x00 ".encode()
    assert parse_tar(bytes(blob)) == [("b.bin", b"q" * 700)]


def test_multi_member_gzip_tar():
    # pigz-style multi-member .tar.gz of ONE archive: members split the
    # compressed stream; all must inflate before the block walk
    import zlib

    from simple_data_engineering_project_spark.operators.shards import (
        encode_tar,
        parse_tar,
    )

    members = [("a.txt", b"alpha"), ("b.txt", b"b" * 600)]
    plain = encode_tar(members)
    half = len(plain) // 2
    blob = b""
    for part in (plain[:half], plain[half:]):
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        blob += co.compress(part) + co.flush()
    assert parse_tar(blob) == members


def test_pax_global_size_default_applies():
    # a pax 'g' header's records are defaults for ALL following members
    from simple_data_engineering_project_spark.operators.shards import (
        encode_tar,
        parse_tar,
    )

    base = bytearray(encode_tar([("a.bin", b"q" * 700)]))
    # zero the octal size field; supply it via a preceding 'g' header
    hdr = bytearray(base[0:512])
    hdr[124:136] = b"00000000000\x00"
    hdr[148:156] = b" " * 8
    csum = sum(hdr)
    hdr[148:156] = f"{csum:06o}\x00 ".encode()
    body = bytes(hdr) + base[512:]
    rec = b"12 size=700\n"
    assert len(rec) == int(rec.split(b" ")[0])
    g = bytearray(512)
    g[0:7] = b"paxglob"
    g[100:108] = b"0000644\x00"
    g[108:116] = b"0000000\x00"
    g[116:124] = b"0000000\x00"
    g[124:136] = f"{len(rec):011o}\x00".encode()
    g[136:148] = b"00000000000\x00"
    g[148:156] = b" " * 8
    g[156:157] = b"g"
    g[257:263] = b"ustar\x00"
    g[263:265] = b"00"
    g[148:156] = f"{sum(g):06o}\x00 ".encode()
    pad = (-len(rec)) % 512
    blob = bytes(g) + rec + b"\x00" * pad + body
    assert parse_tar(blob) == [("a.bin", b"q" * 700)]


def test_tar_zst_sink_shards_genuinely_compressed(spark, sf_smoke):
    """sink_tar_zst's correctness is oracle-graded; this pins that the
    shards it writes are (a) real zstd frames our encoder compressed
    (smaller than the raw tar — documents text is compressible) and
    (b) decodable back to the identical archive bytes."""
    import glob

    from simple_data_engineering_project_spark.operators.zstd import (
        zstd_decompress,
    )
    from simple_data_engineering_project_spark.plans.catalog import (
        _scratch,
        catalog,
    )

    catalog()["sink_tar_zst"].fn(spark, sf_smoke).count()
    shards = glob.glob(f"{_scratch(sf_smoke, 'tar_zst_sink')}/shard-*.tar.zst")
    assert shards
    comp = raw = 0
    for p in shards:
        with open(p, "rb") as f:
            payload = f.read()
        tar = zstd_decompress(payload)
        assert tar[257:262] == b"ustar"
        comp += len(payload)
        raw += len(tar)
    assert comp < raw * 0.8, (comp, raw)
