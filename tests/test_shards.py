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
