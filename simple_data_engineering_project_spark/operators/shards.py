"""Tar / WebDataset shard ingestion in pure stdlib (SURVEY §2 C4/C5).

Multimodal training corpora overwhelmingly ship as WebDataset: plain
tar archives whose members group into samples by basename stem —
``0001.jpg`` + ``0001.txt`` + ``0001.json`` is one sample — consumed
shard-per-worker. This parses that for real:

- tar walk: 512-byte headers (name, octal size field, typeflag, ustar
  prefix), data rounded up to block size, two zero blocks terminate;
  LONG PATHS decode through both mechanisms real archives use — GNU
  ``L`` long-name data blocks (``K`` longlink targets are skipped) and
  pax ``x``/``g`` extended headers ("<len> key=value\n" records,
  ``path`` overriding the next member's name; ``g`` records persist as
  archive-global defaults) — cross-validated against stdlib tarfile's
  GNU_FORMAT and PAX_FORMAT writers;
- optional whole-file gzip (``.tar.gz``) and zstd (``.tar.zst``,
  through the pure-Python RFC 8878 decoder in :mod:`.zstd`) shards,
  both detected by magic;
- WebDataset grouping: members sorted into samples keyed by the name up
  to the FIRST dot, with everything after it the extension (the
  WebDataset rule — ``a.seg.png`` is extension ``seg.png``).

The companion :func:`encode_tar` writes conformant ustar archives so
the oracle entry can verify extraction byte-for-byte. (∅ in reference;
Tier C extension.)
"""

from __future__ import annotations

import zlib


def gunzip_members(payload: bytes) -> bytes:
    """Inflate a gzip file INCLUDING concatenated members (RFC 1952
    allows them; pigz and appending writers produce them — a one-shot
    zlib.decompress stops at the first member and silently discards
    the rest)."""
    out = bytearray()
    rest = payload
    d = None
    while rest:
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(rest)
        out += d.flush()
        rest = d.unused_data
    # decompressobj does NOT raise on a mid-stream cut: it returns the
    # partial output with eof=False. Callers (e.g. the TFRecord walk)
    # would then fail later on the truncated bytes with a misleading
    # framing/CRC error — surface the truncation here instead.
    if d is not None and not d.eof:
        raise zlib.error("truncated gzip stream")
    return bytes(out)


def _octal(field: bytes) -> int:
    if field and field[0] & 0x80:
        # GNU base-256: high bit set, remaining bytes big-endian binary
        # (the >8 GiB size encoding octal cannot express)
        return int.from_bytes(bytes([field[0] & 0x7F]) + field[1:], "big")
    s = field.split(b"\x00")[0].strip()
    return int(s or b"0", 8)


def parse_tar(payload: bytes) -> list[tuple[str, bytes]]:
    """(member name, bytes) in archive order; gzip/zstd by magic."""
    if payload[:3] == b"\x1f\x8b\x08":
        payload = gunzip_members(payload)
    elif payload[:4] == b"\x28\xb5\x2f\xfd":  # .tar.zst
        from .zstd import zstd_decompress

        payload = zstd_decompress(payload)
    out = []
    pos = 0
    n = len(payload)
    # overrides from extension entries, consumed by the NEXT regular
    # member: GNU 'L' long-name data blocks and pax 'x' path records
    pending_name: str | None = None
    pending_size: int | None = None
    pax_globals: dict[str, str] = {}
    while pos + 512 <= n:
        hdr = payload[pos : pos + 512]
        if hdr == b"\x00" * 512:
            break
        name = hdr[0:100].split(b"\x00")[0].decode("utf-8")
        size = _octal(hdr[124:136])
        typeflag = hdr[156:157]
        if typeflag not in (b"L", b"K", b"x", b"g"):
            if pending_size is not None:
                size = pending_size  # pax 'x' size override
                pending_size = None
            elif "size" in pax_globals:
                size = int(pax_globals["size"])  # pax 'g' default
        prefix = hdr[345:500].split(b"\x00")[0].decode("utf-8")
        data = payload[pos + 512 : pos + 512 + size]
        pos += 512 + ((size + 511) // 512) * 512
        if typeflag == b"L":
            # GNU longname: the data IS the next member's full name
            # (NUL-terminated)
            pending_name = data.split(b"\x00")[0].decode("utf-8")
            continue
        if typeflag == b"K":
            continue  # GNU longlink: target of a symlink — irrelevant
        if typeflag in (b"x", b"g"):
            # pax header: "%d %s=%s\n" records; 'path' overrides the
            # next member's name ('g' sets archive-global defaults)
            records: dict[str, str] = {}
            at = 0
            while at < len(data):
                sp = data.index(b" ", at)
                rec_len = int(data[at:sp])
                if rec_len <= 0 or at + rec_len > len(data):
                    raise ValueError("pax record length out of range")
                # record = "<len> <key>=<value>\n"; len counts ALL of it
                rec = data[sp + 1 : at + rec_len - 1]
                k, _, v = rec.partition(b"=")
                records[k.decode("utf-8")] = v.decode("utf-8")
                at += rec_len
            if typeflag == b"g":
                pax_globals.update(records)
            else:
                if "path" in records:
                    pending_name = records["path"]
                if "size" in records:
                    pending_size = int(records["size"])
            continue
        if prefix:
            name = f"{prefix}/{name}"
        if pending_name is not None:
            name = pending_name
            pending_name = None
        elif "path" in pax_globals:
            name = pax_globals["path"]
        if typeflag in (b"0", b"\x00", b""):
            out.append((name, data))
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
