"""WARC (Web ARChive) record parsing in pure stdlib (SURVEY §2 C4/C5).

Common Crawl — the backbone of most web-scale LLM corpora — ships as
WARC: concatenated records of CRLF header blocks (``WARC/1.0``,
``WARC-Type``, ``Content-Length``…) followed by a Content-Length-sized
payload and a blank-line terminator, usually with each record gzipped
as its own member so readers can split mid-file. This module parses
that for real:

- member-wise gzip detection and decompression (``zlib.decompressobj``
  loop over concatenated members — stdlib gzip handles the stream as a
  whole, but WARC readers must also work per member);
- record walk driven by the declared ``Content-Length`` (never by
  scanning for the next ``WARC/1.0`` — payloads legally contain it);
- HTTP response unwrapping for ``WARC-Type: response`` records: the
  payload is a full HTTP message, so the body starts after the first
  blank line.

Out of envelope: chunked transfer encodings inside response payloads
(Common Crawl stores them de-chunked) raise ``NotImplementedError``.
The companion :func:`encode_warc` writes conformant files
(request/response/metadata records per page, optional per-member gzip),
so the oracle entry can verify extraction byte-for-byte.
(∅ in reference; Tier C extension.)
"""

from __future__ import annotations

import zlib


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members into one byte stream."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)  # gzip wrapper
        out += d.decompress(data[pos:])
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("corrupt gzip member in WARC")
        pos += consumed
    return bytes(out)


def parse_warc(payload: bytes) -> list[dict]:
    """Parse a WARC file (plain or member-gzipped) into records:
    [{type, headers, body}] in file order."""
    if payload[:2] == b"\x1f\x8b":
        payload = _gunzip_members(payload)
    if not payload.startswith(b"WARC/"):
        raise ValueError("not a WARC payload")
    records = []
    pos = 0
    n = len(payload)
    while pos < n:
        if not payload.startswith(b"WARC/", pos):
            break
        hdr_end = payload.index(b"\r\n\r\n", pos)
        lines = payload[pos:hdr_end].split(b"\r\n")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(b":")
            # ISO 28500 field names are CASE-INSENSITIVE: a writer
            # emitting 'content-length' must not zero the record length
            # (which would desync the whole walk)
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1"
            )
        length = int(headers.get("content-length", "0"))
        body_start = hdr_end + 4
        body = payload[body_start : body_start + length]
        records.append(
            {
                "type": headers.get("warc-type", ""),
                "headers": headers,
                "body": body,
            }
        )
        pos = body_start + length
        # records terminate with two CRLFs
        while payload.startswith(b"\r\n", pos):
            pos += 2
    return records


def response_bodies(payload: bytes) -> list[tuple[str, bytes]]:
    """(target-uri, HTTP body bytes) for each response record. The
    record payload is a full HTTP message; the body follows the first
    blank line. Chunked transfer encoding raises."""
    out = []
    for rec in parse_warc(payload):
        if rec["type"] != "response":
            continue
        msg = rec["body"]
        sep = msg.find(b"\r\n\r\n")
        http_headers = msg[:sep].lower() if sep >= 0 else b""
        if b"transfer-encoding: chunked" in http_headers:
            raise NotImplementedError(
                "chunked transfer encoding in WARC response payload"
            )
        body = msg[sep + 4 :] if sep >= 0 else msg
        out.append((rec["headers"].get("warc-target-uri", ""), body))
    return out


# --------------------------------------------------------------- encoder


def _record(rtype: str, uri: str, rec_id: int, body: bytes) -> bytes:
    hdr = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rec_id:032x}>\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"Content-Length: {len(body)}\r\n"
        f"\r\n"
    ).encode("latin-1")
    return hdr + body + b"\r\n\r\n"


def encode_warc(
    pages: list[tuple[str, bytes]], gzip_members: bool = False, seed: int = 0
) -> bytes:
    """WARC file with a request + response + metadata record per
    (uri, html_bytes) page; ``gzip_members`` compresses each record as
    its own gzip member, the Common Crawl layout."""
    records = []
    for i, (uri, html) in enumerate(pages):
        req = (
            f"GET / HTTP/1.1\r\nHost: {uri}\r\n\r\n"
        ).encode("latin-1")
        records.append(_record("request", uri, seed * 1000 + 3 * i, req))
        resp = (
            "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            f"Content-Length: {len(html)}\r\n\r\n"
        ).encode("latin-1") + html
        records.append(_record("response", uri, seed * 1000 + 3 * i + 1, resp))
        records.append(
            _record("metadata", uri, seed * 1000 + 3 * i + 2, b"fetch: ok")
        )
    if not gzip_members:
        return b"".join(records)
    out = bytearray()
    for rec in records:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)  # gzip wrapper
        out += co.compress(rec) + co.flush()
    return bytes(out)
