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


def test_webdataset_stem_grouping():
    g = group_webdataset(parse_tar(encode_tar(MEMBERS)))
    assert g["000/0001"] == {
        "txt": b"hello",
        "json": b'{"a":1}',
        "seg.png": b"\x89PNG fake",  # extension = after FIRST dot
    }
    assert g["000/0002"] == {"txt": b"x" * 600}


def test_gnu_longname_raises():
    p = bytearray(encode_tar([("a.txt", b"x")]))
    p[156] = ord("L")  # claim a GNU long-name entry
    with pytest.raises(NotImplementedError, match="long-name"):
        parse_tar(bytes(p))

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

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("b.txt", b"x" * 100, compress_type=zipfile.ZIP_BZIP2)
    with pytest.raises(NotImplementedError, match="method"):
        parse_zip(buf.getvalue())

    blob = bytearray(encode_zip([("a.txt", b"payload bytes")], method=0))
    at = blob.index(b"payload bytes")
    blob[at] ^= 0xFF  # flip a stored byte -> CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        parse_zip(bytes(blob))
    with pytest.raises(ValueError, match="end-of-central"):
        parse_zip(b"not a zip at all")
