"""Zip shard ingestion in pure stdlib (SURVEY §2 C4/C5).

Plenty of public corpora and Kaggle-style dumps ship as plain ``.zip``
archives (images + sidecar labels, document batches), and WebDataset's
grouping rule applies to them just as well as to tar. This parses the
format for real, the way a robust reader must:

- the walk is driven by the END OF CENTRAL DIRECTORY record (scan the
  last 64 KiB + 22 bytes for ``PK\\x05\\x06`` — the comment makes the
  EOCD position variable) and the CENTRAL directory, never by scanning
  for local-header magics (compressed bodies legally contain ``PK``
  lookalikes — the same rule as the PDF/TIFF/MP4 walkers);
- per entry the central record's sizes are authoritative (local headers
  may carry zeros + a trailing data descriptor when flag bit 3 is set);
  the local header is visited only to skip its own name/extra fields;
- methods 0 (stored), 8 (deflate, raw zlib), 12 (bzip2), 14
  (zip-LZMA, re-framed to a stdlib ALONE header with the central
  record's size), and 93 (Zstandard, through the pure-Python RFC 8878
  decoder in :mod:`.zstd`) decompress; the CRC-32 of every
  decompressed member is VERIFIED against the central record;
- ZIP64 decodes for real — multi-GB shards and >65,535-member archives
  are normal at corpus scale: a 0xFFFF/0xFFFFFFFF sentinel in the EOCD
  routes through the zip64 EOCD locator (``PK\\x06\\x07``, fixed 20
  bytes before the EOCD) to the zip64 EOCD record (``PK\\x06\\x06``),
  and per-entry sentinels resolve through the 0x0001 extra field,
  whose 8-byte values appear IN ORDER only for the fields that are
  actually maxed.

Out of envelope (honest ``NotImplementedError``): encrypted entries
(flag bit 0), multi-disk archives, and the remaining exotic methods
(ppmd/xz members are rare in corpus dumps). The companion
:func:`encode_zip` writes conformant archives so the oracle entry
verifies extraction byte-for-byte; tests cross-validate BOTH
directions against stdlib :mod:`zipfile`, including forced-zip64
members and a >65,535-member archive. (∅ in reference; Tier C
extension.)
"""

from __future__ import annotations

import struct
import zlib

_EOCD_SIG = b"PK\x05\x06"
_EOCD64_LOC_SIG = b"PK\x06\x07"
_EOCD64_SIG = b"PK\x06\x06"
_CEN_SIG = b"PK\x01\x02"
_LOC_SIG = b"PK\x03\x04"


def _zip64_extra(
    extra: bytes, usize: int, csize: int, loc_off: int
) -> tuple[int, int, int]:
    """Resolve 0xFFFFFFFF sentinels through the 0x0001 extra field —
    its 8-byte values appear in (usize, csize, loc_off) order but ONLY
    for fields that are actually maxed."""
    pos = 0
    while pos + 4 <= len(extra):
        hid, hsz = struct.unpack_from("<HH", extra, pos)
        pos += 4
        if hid == 0x0001:
            z = extra[pos : pos + hsz]
            at = 0
            if usize == 0xFFFFFFFF:
                (usize,) = struct.unpack_from("<Q", z, at)
                at += 8
            if csize == 0xFFFFFFFF:
                (csize,) = struct.unpack_from("<Q", z, at)
                at += 8
            if loc_off == 0xFFFFFFFF:
                (loc_off,) = struct.unpack_from("<Q", z, at)
                at += 8
            return usize, csize, loc_off
        pos += hsz
    raise ValueError("zip64 sentinel without a 0x0001 extra field")


def parse_zip(payload: bytes) -> list[tuple[str, bytes]]:
    """(member name, bytes) in central-directory order; CRC verified."""
    tail_start = max(0, len(payload) - (1 << 16) - 22)
    # Scan backwards over EOCD-signature candidates: an archive COMMENT
    # may itself contain the 'PK\x05\x06' bytes (they sit after the real
    # record, so a bare rfind would lock onto the lookalike). A comment
    # can even embed a fully self-consistent EMPTY-zip EOCD (20 zero
    # bytes after the signature, comment-length 0 landing on EOF), so
    # comment-length alone cannot disambiguate: prefer the candidate
    # whose central directory also ends exactly at the record
    # (cd_off + cd_size == candidate — true for every archive without
    # prepended data), falling back to comment-length consistency alone
    # for prefix-shifted archives.
    eocd = -1
    fallback = -1
    cand = payload.rfind(_EOCD_SIG, tail_start)
    while cand >= 0:
        if cand + 22 <= len(payload):
            (cd_size_cand, cd_off_cand, clen_cand) = struct.unpack(
                "<IIH", payload[cand + 12 : cand + 22]
            )
            if cand + 22 + clen_cand == len(payload):
                # zip64: the locator sits between the central directory
                # and the EOCD, so cd_off+cd_size lands at the EOCD64
                # record instead of the EOCD — the locator signature is
                # the consistency anchor there
                is_z64 = (
                    cand >= 20
                    and payload[cand - 20 : cand - 16] == _EOCD64_LOC_SIG
                )
                if cd_off_cand + cd_size_cand == cand or is_z64:
                    eocd = cand
                    break
                if fallback < 0:
                    fallback = cand
        cand = payload.rfind(_EOCD_SIG, tail_start, cand)
    if eocd < 0:
        eocd = fallback
    if eocd < 0:
        raise ValueError("no zip end-of-central-directory record")
    (n_disk, cd_disk, n_here, n_total, cd_size, cd_off, _clen) = struct.unpack(
        "<HHHHIIH", payload[eocd + 4 : eocd + 22]
    )
    if n_disk or cd_disk:
        raise NotImplementedError("multi-disk zip")
    if 0xFFFF in (n_total, n_here) or 0xFFFFFFFF in (cd_off, cd_size):
        # zip64: the fixed-size locator sits immediately before the EOCD
        loc_at = eocd - 20
        if loc_at < 0 or payload[loc_at : loc_at + 4] != _EOCD64_LOC_SIG:
            raise ValueError("zip64 sentinels without an EOCD64 locator")
        (z_disk, z_off, z_ndisks) = struct.unpack(
            "<IQI", payload[loc_at + 4 : loc_at + 20]
        )
        if z_disk or z_ndisks > 1:
            raise NotImplementedError("multi-disk zip64")
        if payload[z_off : z_off + 4] != _EOCD64_SIG:
            raise ValueError("zip64 EOCD record signature mismatch")
        (zn_disk, zcd_disk, zn_here, zn_total, zcd_size, zcd_off) = (
            struct.unpack("<IIQQQQ", payload[z_off + 16 : z_off + 56])
        )
        if zn_disk or zcd_disk:
            raise NotImplementedError("multi-disk zip64")
        n_total, cd_size, cd_off = zn_total, zcd_size, zcd_off
    out = []
    pos = cd_off
    for _ in range(n_total):
        if payload[pos : pos + 4] != _CEN_SIG:
            raise ValueError("central directory entry signature mismatch")
        (
            _vmade, _vneed, flags, method, _t, _d, crc, csize, usize,
            nlen, xlen, clen, _dn, _ia, _ea, loc_off,
        ) = struct.unpack("<HHHHHHIIIHHHHHII", payload[pos + 4 : pos + 46])
        name = payload[pos + 46 : pos + 46 + nlen].decode("utf-8")
        extra = payload[pos + 46 + nlen : pos + 46 + nlen + xlen]
        pos += 46 + nlen + xlen + clen
        if flags & 0x1:
            raise NotImplementedError("encrypted zip entry")
        if 0xFFFFFFFF in (csize, usize, loc_off):
            usize, csize, loc_off = _zip64_extra(extra, usize, csize, loc_off)
        if payload[loc_off : loc_off + 4] != _LOC_SIG:
            raise ValueError("local header signature mismatch")
        lnlen, lxlen = struct.unpack(
            "<HH", payload[loc_off + 26 : loc_off + 30]
        )
        data_at = loc_off + 30 + lnlen + lxlen
        body = payload[data_at : data_at + csize]
        if method == 0:
            data = body
        elif method == 8:
            data = zlib.decompress(body, wbits=-15)
        elif method == 12:
            import bz2

            data = bz2.decompress(body)
        elif method == 14:
            # zip-LZMA member: version(2) + props-size(2) + raw LZMA1
            # properties, then the stream. Re-frame as an ALONE header
            # (props + 8-byte size) for the stdlib decompressor; the
            # central usize supplies the size the zip layout omits.
            import lzma

            (psize,) = struct.unpack_from("<H", body, 2)
            if psize != 5:
                raise ValueError(f"zip lzma props size {psize}")
            hdr = body[4:9] + usize.to_bytes(8, "little")
            data = lzma.LZMADecompressor(lzma.FORMAT_ALONE).decompress(
                hdr + body[9:]
            )
        elif method == 93:
            # Zstandard member (APPNOTE 6.3.7+): the body is one raw
            # zstd frame
            from .zstd import zstd_decompress

            data = zstd_decompress(body)
        else:
            raise NotImplementedError(f"zip compression method {method}")
        if len(data) != usize or (zlib.crc32(data) & 0xFFFFFFFF) != crc:
            raise ValueError(f"zip member CRC/size mismatch: {name}")
        if not name.endswith("/"):  # skip directory entries
            out.append((name, data))
    return out


def encode_zip(
    members: list[tuple[str, bytes]], method: int = 8, zip64: bool = False
) -> bytes:
    """Minimal conformant zip: local headers + central directory + EOCD,
    method 0 (stored), 8 (deflate), or 93 (Zstandard — compressed with
    pyarrow's bundled reference encoder, so reading it back through
    operators/zstd.py stays a cross-implementation check).

    ``zip64=True`` writes the full zip64 LAYOUT regardless of size —
    every central size/offset maxed into a 0x0001 extra, an EOCD64
    record + locator, sentineled EOCD counts — the wire shape any
    multi-GB or >65,535-member shard carries (stdlib zipfile reads it,
    so the layout is cross-validatable)."""
    if method not in (0, 8, 93):
        raise ValueError("method must be 0 (stored), 8 (deflate), or 93")
    out = bytearray()
    central = bytearray()
    for name, data in members:
        nb = name.encode("utf-8")
        crc = zlib.crc32(data) & 0xFFFFFFFF
        if method == 8:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            body = co.compress(data) + co.flush()
        elif method == 93:
            import pyarrow as _pa

            body = _pa.Codec("zstd").compress(data, asbytes=True)
        else:
            body = data
        loc_off = len(out)
        if zip64:
            vneed = 45
            lextra = struct.pack(
                "<HHQQ", 0x0001, 16, len(data), len(body)
            )
            out += (
                _LOC_SIG
                + struct.pack(
                    "<HHHHHIII", vneed, 0, method, 0, 0x21, crc,
                    0xFFFFFFFF, 0xFFFFFFFF,
                )
                + struct.pack("<HH", len(nb), len(lextra))
                + nb
                + lextra
                + body
            )
            cextra = struct.pack(
                "<HHQQQ", 0x0001, 24, len(data), len(body), loc_off
            )
            central += (
                _CEN_SIG
                + struct.pack(
                    "<HHHHHHIII", vneed, vneed, 0, method, 0, 0x21, crc,
                    0xFFFFFFFF, 0xFFFFFFFF,
                )
                + struct.pack(
                    "<HHHHHII", len(nb), len(cextra), 0, 0, 0, 0,
                    0xFFFFFFFF,
                )
                + nb
                + cextra
            )
        else:
            common = struct.pack(
                "<HHHHIII", 0, method, 0, 0x21, crc, len(body), len(data)
            )  # flags, method, time, date, crc, csize, usize
            out += (
                _LOC_SIG
                + struct.pack("<H", 20)
                + common
                + struct.pack("<HH", len(nb), 0)
                + nb
                + body
            )
            central += (
                _CEN_SIG
                + struct.pack("<HH", 20, 20)
                + common
                + struct.pack("<HHHHHII", len(nb), 0, 0, 0, 0, 0, loc_off)
                + nb
            )
    cd_off = len(out)
    out += central
    if zip64:
        z64_at = len(out)
        out += _EOCD64_SIG + struct.pack(
            "<QHHIIQQQQ", 44, 45, 45, 0, 0,
            len(members), len(members), len(central), cd_off,
        )
        out += _EOCD64_LOC_SIG + struct.pack("<IQI", 0, z64_at, 1)
        out += _EOCD_SIG + struct.pack(
            "<HHHHIIH", 0, 0, 0xFFFF, 0xFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0
        )
    else:
        out += _EOCD_SIG + struct.pack(
            "<HHHHIIH", 0, 0, len(members), len(members), len(central),
            cd_off, 0,
        )
    return bytes(out)
