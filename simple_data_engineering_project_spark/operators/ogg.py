"""Ogg container parsing in pure stdlib (SURVEY §2 C5).

Speech/audio corpora that ship Opus or Vorbis (VoxPopuli, Common Voice
exports) arrive in Ogg, and — like RIFF/AVI, ISO-BMFF and Matroska —
extracting the packet stream needs NO codec: it is a pure page walk.
Each page is ``OggS`` + version(0) + header-type flags (0x1 continued
packet, 0x2 BOS, 0x4 EOS) + a 64-bit little-endian granule position +
serial + sequence + CRC-32 + a lacing table (segment lengths; a value
of 255 means the packet continues in the next segment, and a packet
whose final segment hits the page boundary continues on the NEXT page,
flagged 0x1 there). This module implements that walk for real:

- per-page CRC-32 VERIFIED (the Ogg polynomial 0x04C11DB7,
  non-reflected, zero init and zero final xor, computed with the CRC
  field zeroed — pinned against the published CRC-32/POSIX check
  value);
- packet reassembly across lacing values AND page boundaries
  (continued-packet flag checked both directions);
- page-sequence-gap detection per logical stream (serial number);
- granule positions give each packet a codec-free clock: a packet
  completing on a page gets that page's granule, which is how
  time-bucket sampling works without decoding a single audio frame.

The companion :func:`encode_ogg` writes conformant streams with
caller-chosen packet bytes, granules, and page splits, so the oracle
entry can predict sampled-packet hashes in closed form. (∅ in
reference; Tier C extension; mirrors operators/mp4.py and mkv.py.)
"""

from __future__ import annotations

import struct

_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if _r & 0x80000000 else (_r << 1)
        _r &= 0xFFFFFFFF
    _CRC_TABLE.append(_r)


def ogg_crc(data: bytes) -> int:
    """The Ogg page CRC: poly 0x04C11DB7, no reflection, init/xorout 0
    (== CRC-32/POSIX without its final complement)."""
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((r >> 24) & 0xFF) ^ b]
    return r


def parse_ogg(payload: bytes) -> list[tuple[int, bytes]]:
    """(granule_at_completion, packet bytes) for every packet, in
    stream order; page CRCs verified, continued packets reassembled
    across pages."""
    if payload[:4] != b"OggS":
        raise ValueError("not an Ogg payload")
    out: list[tuple[int, bytes]] = []
    partial: dict[int, bytearray] = {}  # serial -> packet under assembly
    last_seq: dict[int, int] = {}
    pos = 0
    n = len(payload)
    while pos < n:
        if payload[pos : pos + 4] != b"OggS":
            raise ValueError(f"bad Ogg page capture at {pos}")
        version, flags = payload[pos + 4], payload[pos + 5]
        if version != 0:
            raise NotImplementedError(f"Ogg stream structure v{version}")
        granule, serial, seq, crc, nsegs = struct.unpack(
            "<qIIIB", payload[pos + 6 : pos + 27]
        )
        lacing = payload[pos + 27 : pos + 27 + nsegs]
        body_at = pos + 27 + nsegs
        body_len = sum(lacing)
        page = bytearray(payload[pos : body_at + body_len])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc:
            raise ValueError(f"Ogg page CRC mismatch at {pos}")
        if serial in last_seq and seq != last_seq[serial] + 1:
            raise ValueError("Ogg page sequence gap")
        last_seq[serial] = seq
        continued = bool(flags & 0x1)
        if continued != (serial in partial):
            raise ValueError("Ogg continued-packet flag inconsistency")
        acc = partial.pop(serial, bytearray())
        at = body_at
        open_packet = False
        for k, lv in enumerate(lacing):
            acc += payload[at : at + lv]
            at += lv
            if lv < 255:
                out.append((granule, bytes(acc)))
                acc = bytearray()
                open_packet = False
            else:
                open_packet = True
        if open_packet or (acc and not lacing):
            partial[serial] = acc
        pos = body_at + body_len
    if any(partial.values()):
        raise ValueError("Ogg stream ends mid-packet")
    return out


def sample_ogg_packets(
    payload: bytes, every_ms: int = 1000, rate: int = 48000
) -> list[bytes]:
    """Keep the first packet per ``every_ms`` bucket of granule time —
    the shared time-bucket rule of the AVI/MP4/MKV samplers, driven
    purely by container granule positions (no codec)."""
    got: dict[int, bytes] = {}
    for granule, pkt in parse_ogg(payload):
        bucket = (granule * 1000 // rate) // every_ms
        if bucket not in got:
            got[bucket] = pkt
    return [got[k] for k in sorted(got)]


def encode_ogg(
    packets: list[tuple[bytes, int]],
    serial: int = 0x5D3A,
    packets_per_page: int = 1,
    split_at: int | None = None,
) -> bytes:
    """Write an Ogg stream from (packet bytes, granule) pairs. The
    granule stamped on a page is the granule of the last packet that
    COMPLETES there. ``split_at`` force-splits every packet's body at
    that byte offset across two pages (continued-packet exercise)."""
    out = bytearray()
    seq = 0

    def emit(page_packets, granule, flags):
        nonlocal seq
        lacing = bytearray()
        body = bytearray()
        for data, complete in page_packets:
            q, r = divmod(len(data), 255)
            lacing += b"\xff" * q
            if complete:
                lacing.append(r)
            elif r:
                raise ValueError("incomplete packet must end at 255 boundary")
            body += data
        hdr = b"OggS" + bytes([0, flags]) + struct.pack(
            "<qIIIB", granule, serial, seq, 0, len(lacing)
        )
        page = bytearray(hdr + lacing + body)
        page[22:26] = struct.pack("<I", ogg_crc(bytes(page)))
        out.extend(page)
        seq += 1

    i = 0
    while i < len(packets):
        group = packets[i : i + packets_per_page]
        is_first = i == 0
        is_last_group = i + packets_per_page >= len(packets)
        base_flags = (0x2 if is_first else 0) | (0x4 if is_last_group else 0)
        if split_at is not None and len(group) == 1 and len(
            group[0][0]
        ) > split_at:
            data, granule = group[0]
            head_len = (split_at // 255) * 255
            if head_len == 0:
                raise ValueError("split_at must allow a 255-multiple head")
            emit(
                [(data[:head_len], False)],
                -1,  # no packet completes on this page
                0x2 if is_first else 0,
            )
            emit(
                [(data[head_len:], True)],
                granule,
                0x1 | (0x4 if is_last_group else 0),
            )
        else:
            emit(
                [(d, True) for d, _g in group],
                group[-1][1],
                base_flags,
            )
        i += packets_per_page
    return bytes(out)
