"""EXIF metadata extraction in pure stdlib (SURVEY §2 C5).

Image-corpus curation filters on EXIF constantly (orientation fixing,
camera-model dedup, capture-time bucketing), and EXIF is just a TIFF
IFD structure embedded in a JPEG APP1 segment: ``Exif\\x00\\x00`` +
TIFF header (``II``/``MM`` byte order, magic 42, IFD0 offset) + IFD
entry tables of (tag, type, count, value-or-offset) 12-byte records,
where values wider than 4 bytes live at an OFFSET relative to the TIFF
header — the part naive parsers get wrong, exercised here by ASCII
strings and RATIONALs which are always indirect. IFD0's ExifIFD
pointer tag (0x8769) is followed to the private IFD.

Types handled: BYTE(1), ASCII(2, NUL-terminated), SHORT(3), LONG(4),
RATIONAL(5, num/den pair), UNDEFINED(7, raw), SLONG(9), SRATIONAL(10).
The companion :func:`encode_exif_jpeg` prepends a conformant APP1 to a
real JPEG so the oracle entry predicts every field in closed form;
unit tests pin exact APP1 bytes for a known case in BOTH byte orders
so encoder and decoder are not merely self-consistent.
(∅ in reference; Tier C extension.)
"""

from __future__ import annotations

import struct

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}
EXIF_IFD_TAG = 0x8769


def _read_ifd(tiff: bytes, at: int, end_: str) -> dict[int, object]:
    n = struct.unpack_from(end_ + "H", tiff, at)[0]
    out: dict[int, object] = {}
    for i in range(n):
        e = at + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(end_ + "HHI", tiff, e)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue  # unknown type: skip per spec
        total = size * cnt
        if total <= 4:
            data = tiff[e + 8 : e + 8 + total]
        else:
            off = struct.unpack_from(end_ + "I", tiff, e + 8)[0]
            data = tiff[off : off + total]
        if typ == 2:
            out[tag] = data.split(b"\x00")[0].decode("ascii", "replace")
        elif typ == 3:
            v = struct.unpack(end_ + f"{cnt}H", data)
            out[tag] = v[0] if cnt == 1 else list(v)
        elif typ in (4, 9):
            fmt = "I" if typ == 4 else "i"
            v = struct.unpack(end_ + f"{cnt}{fmt}", data)
            out[tag] = v[0] if cnt == 1 else list(v)
        elif typ in (5, 10):
            fmt = "II" if typ == 5 else "ii"
            pairs = [
                struct.unpack_from(end_ + fmt, data, 8 * k)
                for k in range(cnt)
            ]
            out[tag] = pairs[0] if cnt == 1 else pairs
        else:  # BYTE/UNDEFINED
            out[tag] = bytes(data)
    return out


def parse_exif(jpeg: bytes) -> dict[int, object]:
    """Extract the merged IFD0 + ExifIFD tag dict from a JPEG's APP1
    segment. Raises ValueError when no EXIF APP1 is present."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    n = len(jpeg)
    while pos + 4 <= n:
        if jpeg[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xDA, 0xD9):  # scan start / EOI: no EXIF found
            break
        seg_len = struct.unpack(">H", jpeg[pos + 2 : pos + 4])[0]
        body = jpeg[pos + 4 : pos + 2 + seg_len]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            tiff = body[6:]
            order = tiff[:2]
            if order == b"II":
                end_ = "<"
            elif order == b"MM":
                end_ = ">"
            else:
                raise ValueError("bad TIFF byte order in EXIF")
            magic, ifd0 = struct.unpack_from(end_ + "HI", tiff, 2)
            if magic != 42:
                raise ValueError("bad TIFF magic in EXIF")
            tags = _read_ifd(tiff, ifd0, end_)
            sub = tags.pop(EXIF_IFD_TAG, None)
            if isinstance(sub, int):
                tags.update(_read_ifd(tiff, sub, end_))
            return tags
        pos += 2 + seg_len
    raise ValueError("no EXIF APP1 segment")


def build_exif_app1(
    ifd0: list[tuple[int, int, object]],
    exif_ifd: list[tuple[int, int, object]] | None = None,
    byte_order: str = "II",
) -> bytes:
    """Build an APP1 EXIF segment (marker + length + payload) from
    (tag, type, value) lists; wide values are placed in the data area
    behind the IFDs, exactly like real writers."""
    end_ = "<" if byte_order == "II" else ">"

    def pack_entries(entries, data_at, data: bytearray):
        out = bytearray(struct.pack(end_ + "H", len(entries)))
        for tag, typ, val in entries:
            if typ == 2:
                raw = val.encode("ascii") + b"\x00"
                cnt = len(raw)
            elif typ == 3:
                vals = val if isinstance(val, list) else [val]
                raw = struct.pack(end_ + f"{len(vals)}H", *vals)
                cnt = len(vals)
            elif typ in (4, 9):
                vals = val if isinstance(val, list) else [val]
                fmt = "I" if typ == 4 else "i"
                raw = struct.pack(end_ + f"{len(vals)}{fmt}", *vals)
                cnt = len(vals)
            elif typ in (5, 10):
                pairs = val if isinstance(val, list) else [val]
                fmt = "II" if typ == 5 else "ii"
                raw = b"".join(struct.pack(end_ + fmt, *p) for p in pairs)
                cnt = len(pairs)
            else:
                raw = bytes(val)
                cnt = len(raw)
            ent = struct.pack(end_ + "HHI", tag, typ, cnt)
            if len(raw) <= 4:
                ent += raw + b"\x00" * (4 - len(raw))
            else:
                ent += struct.pack(end_ + "I", data_at + len(data))
                data += raw
                if len(raw) & 1:
                    data += b"\x00"
            out += ent
        out += struct.pack(end_ + "I", 0)  # next-IFD pointer
        return out

    # layout: header(8) | IFD0 | [ExifIFD] | data area
    n0 = len(ifd0) + (1 if exif_ifd else 0)
    ifd0_at = 8
    ifd0_size = 2 + 12 * n0 + 4
    exif_at = ifd0_at + ifd0_size
    exif_size = (2 + 12 * len(exif_ifd) + 4) if exif_ifd else 0
    data_at = exif_at + exif_size
    data = bytearray()
    entries0 = list(ifd0)
    if exif_ifd:
        entries0.append((EXIF_IFD_TAG, 4, exif_at))
    entries0.sort(key=lambda t: t[0])  # spec: ascending tag order
    blob0 = pack_entries(entries0, data_at, data)
    blob1 = (
        pack_entries(sorted(exif_ifd, key=lambda t: t[0]), data_at, data)
        if exif_ifd
        else b""
    )
    tiff = (
        byte_order.encode()
        + struct.pack(end_ + "HI", 42, ifd0_at)
        + blob0
        + blob1
        + bytes(data)
    )
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def encode_exif_jpeg(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after SOI of a real JPEG."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    return jpeg[:2] + app1 + jpeg[2:]
