"""Tar / WebDataset shard ingestion in pure stdlib (SURVEY §2 C4/C5).

Multimodal training corpora overwhelmingly ship as WebDataset: plain
tar archives whose members group into samples by basename stem —
``0001.jpg`` + ``0001.txt`` + ``0001.json`` is one sample — consumed
shard-per-worker. This parses that for real:

- tar walk: 512-byte headers (name, octal size field, typeflag, ustar
  prefix), data rounded up to block size, two zero blocks terminate;
  GNU long-name entries (typeflag ``L``/``K``) raise — WebDataset
  writers emit plain ustar;
- optional whole-file gzip (``.tar.gz`` shards);
- WebDataset grouping: members sorted into samples keyed by the name up
  to the FIRST dot, with everything after it the extension (the
  WebDataset rule — ``a.seg.png`` is extension ``seg.png``).

The companion :func:`encode_tar` writes conformant ustar archives so
the oracle entry can verify extraction byte-for-byte. (∅ in reference;
Tier C extension.)
"""

from __future__ import annotations

import zlib


def _octal(field: bytes) -> int:
    s = field.split(b"\x00")[0].strip()
    return int(s or b"0", 8)


def parse_tar(payload: bytes) -> list[tuple[str, bytes]]:
    """(member name, bytes) in archive order; gzip detected by magic."""
    if payload[:2] == b"\x1f\x8b":
        payload = zlib.decompress(payload, wbits=31)
    out = []
    pos = 0
    n = len(payload)
    while pos + 512 <= n:
        hdr = payload[pos : pos + 512]
        if hdr == b"\x00" * 512:
            break
        name = hdr[0:100].split(b"\x00")[0].decode("utf-8")
        size = _octal(hdr[124:136])
        typeflag = hdr[156:157]
        prefix = hdr[345:500].split(b"\x00")[0].decode("utf-8")
        if typeflag in (b"L", b"K"):
            raise NotImplementedError("GNU long-name tar extensions")
        if prefix:
            name = f"{prefix}/{name}"
        data = payload[pos + 512 : pos + 512 + size]
        if typeflag in (b"0", b"\x00", b""):
            out.append((name, data))
        pos += 512 + ((size + 511) // 512) * 512
    return out


def group_webdataset(members: list[tuple[str, bytes]]) -> dict[str, dict[str, bytes]]:
    """samples keyed by stem; each a {extension: bytes} dict. The stem
    is the name up to the FIRST dot (WebDataset rule)."""
    samples: dict[str, dict[str, bytes]] = {}
    for name, data in members:
        base = name.rsplit("/", 1)[-1]
        stem, _, ext = base.partition(".")
        key = name[: len(name) - len(base)] + stem
        samples.setdefault(key, {})[ext] = data
    return samples


def encode_tar(
    members: list[tuple[str, bytes]], gzipped: bool = False
) -> bytes:
    """Minimal ustar archive; checksummed headers, 512-byte blocks,
    two-zero-block terminator."""
    out = bytearray()
    for name, data in members:
        nb = name.encode("utf-8")
        if len(nb) > 100:
            raise ValueError("name too long for plain ustar")
        hdr = bytearray(512)
        hdr[0 : len(nb)] = nb
        hdr[100:108] = b"0000644\x00"
        hdr[108:116] = b"0000000\x00"
        hdr[116:124] = b"0000000\x00"
        hdr[124:136] = f"{len(data):011o}\x00".encode()
        hdr[136:148] = b"00000000000\x00"
        hdr[148:156] = b" " * 8  # checksum placeholder
        hdr[156:157] = b"0"
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        csum = sum(hdr)
        hdr[148:156] = f"{csum:06o}\x00 ".encode()
        out += hdr + data
        pad = (-len(data)) % 512
        out += b"\x00" * pad
    out += b"\x00" * 1024
    if gzipped:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return co.compress(bytes(out)) + co.flush()
    return bytes(out)
