"""PDF text extraction in pure stdlib (SURVEY §2 C4/C5).

Document corpora are PDF-first, and the extraction step is the entry
point of every OCR-free text pipeline. This is a REAL extractor for the
format's text core:

- object scan: ``N G obj … endobj`` bodies located directly (robust to
  both classic xref tables and xref-stream files, neither of which needs
  parsing when objects are top-level);
- stream decoding: ``/FlateDecode`` via stdlib zlib and ``/LZWDecode``
  via the TIFF-variant LZW codec (:mod:`.tiff` — PDF specifies the same
  MSB-first EarlyChange scheme), plus raw streams;
- content-stream tokenizer: page streams are walked for text-showing
  operators — ``Tj`` (literal string), ``'`` (next-line show), and
  ``TJ`` (array of strings and kerning numbers) — with full literal
  escape handling (``\\n \\r \\t \\b \\f \\( \\) \\\\``, octal ``\\ddd``,
  line continuations) and ``<hex>`` string decoding; ``BT``/``ET`` and
  positioning operators delimit text blocks (``Td``/``T*``/``'`` start
  new lines).

Out of envelope (honest ``NotImplementedError``): encrypted files,
compressed object streams (``/ObjStm`` — objects hidden inside another
stream), and non-text filters on page content (DCTDecode etc.).
Composite-font CMap remapping is NOT undone — extraction yields the
string bytes as encoded, exactly what pdftotext does without a
ToUnicode map. (∅ in reference; Tier C extension.)

The companion :func:`encode_pdf` writes conformant single-page-per-N
files (catalog + page tree + Flate/LZW/raw content streams + a classic
xref table), so the oracle entry can verify extraction byte-for-byte
against a closed-form reconstruction of the source text.
"""

from __future__ import annotations

import re
import zlib


def _decode_stream(params: bytes, raw: bytes) -> bytes:
    if b"/Filter" not in params:
        return raw
    if b"/FlateDecode" in params:
        return zlib.decompress(raw)
    if b"/LZWDecode" in params:
        from .tiff import _tiff_lzw_decode

        return _tiff_lzw_decode(raw)
    raise NotImplementedError(
        "unsupported PDF stream filter (FlateDecode/LZWDecode/raw only)"
    )


_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\x08", b"f": b"\x0c",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _literal_string(data: bytes, pos: int) -> tuple[bytes, int]:
    """Parse a ( … ) literal starting AT the '(' — returns (bytes, next)."""
    out = bytearray()
    depth = 1
    i = pos + 1
    n = len(data)
    while i < n and depth:
        c = data[i : i + 1]
        if c == b"\\":
            nxt = data[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
            elif nxt in (b"0", b"1", b"2", b"3", b"4", b"5", b"6", b"7"):
                # octal escapes are \[0-7]{1,3}; '\8'/'\9' are NOT octal
                # (spec: unrecognized escape = drop backslash, keep char)
                j = i + 1
                while j < min(i + 4, n) and data[j : j + 1] in (
                    b"0", b"1", b"2", b"3", b"4", b"5", b"6", b"7"
                ):
                    j += 1
                out.append(int(data[i + 1 : j], 8) & 0xFF)
                i = j
            elif nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                if nxt == b"\r" and data[i : i + 1] == b"\n":
                    i += 1
            else:
                out += nxt
                i += 2
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return bytes(out), i


def _extract_text_from_content(content: bytes) -> str:
    """Walk a page content stream for text-showing operators. Strings
    shown by consecutive Tj/TJ on the same line concatenate; Td, TD,
    T*, ' and ET start a new line."""
    lines: list[bytes] = [b""]
    i = 0
    n = len(content)
    token = b""

    def newline() -> None:
        if lines[-1]:
            lines.append(b"")

    pending: list[bytes] = []  # strings seen since the last operator
    while i < n:
        c = content[i : i + 1]
        if c == b"(":
            s, i = _literal_string(content, i)
            pending.append(s)
            token = b""
            continue
        if c == b"<" and content[i + 1 : i + 2] != b"<":
            j = content.index(b">", i)
            hx = re.sub(rb"\s", b"", content[i + 1 : j])
            if len(hx) % 2:
                hx += b"0"
            pending.append(bytes.fromhex(hx.decode("ascii")))
            i = j + 1
            token = b""
            continue
        if c in b" \t\r\n[]":
            if token in (b"Tj", b"TJ"):
                lines[-1] += b"".join(pending)
                pending = []
            elif token == b"'":
                newline()
                lines[-1] += b"".join(pending)
                pending = []
            elif token in (b"Td", b"TD", b"T*", b"ET"):
                newline()
                pending = []
            elif token and token not in (b"BT",):
                # any other operator consumes pending operands
                if token[:1].isalpha():
                    pending = []
            token = b""
            i += 1
            continue
        token += c
        i += 1
    return "\n".join(
        ln.decode("latin-1") for ln in lines if ln
    )


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


def extract_pdf_text(payload: bytes) -> str:
    """Extract the text of every page content stream, in object order.

    The object walk is a SEQUENTIAL cursor that jumps over stream bodies
    using the dict's direct ``/Length`` — compressed bytes routinely
    contain ``endobj``/``N 0 obj`` lookalikes, so a global regex scan
    (or a naive find-next-endobj) silently truncates objects. Indirect
    ``/Length n 0 R`` falls back to an ``endstream`` search."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    if b"/Encrypt" in payload:
        raise NotImplementedError("encrypted PDF")
    texts: list[str] = []
    pos = 0
    n = len(payload)
    while pos < n:
        m = _OBJ_RE.search(payload, pos)
        if m is None:
            break
        start = m.end()
        sp = payload.find(b"stream", start)
        ep_obj = payload.find(b"endobj", start)
        if sp < 0 or (0 <= ep_obj < sp):
            # streamless object
            pos = (ep_obj + 6) if ep_obj >= 0 else n
            continue
        params = payload[start:sp]
        if b"/ObjStm" in params:
            raise NotImplementedError("compressed object streams (/ObjStm)")
        data_start = sp + len(b"stream")
        if payload[data_start : data_start + 2] == b"\r\n":
            data_start += 2
        elif payload[data_start : data_start + 1] == b"\n":
            data_start += 1
        # the direct/indirect split must NOT rely on a lookahead after
        # (\d+): the regex engine backtracks the capture ('15 0 R' ->
        # capture '1', lookahead sees '5') and silently truncates the
        # stream — match the full number first, THEN inspect what
        # follows it
        mlen = re.search(rb"/Length\s+(\d+)", params)
        if mlen and not re.match(rb"\s+\d+\s+R", params[mlen.end() :]):
            data_end = data_start + int(mlen.group(1))
            raw = payload[data_start:data_end]
            es = payload.find(b"endstream", data_end)
        else:  # indirect /Length: fall back to the next endstream
            es = payload.find(b"endstream", data_start)
            raw = payload[data_start:es].rstrip(b"\r\n") if es >= 0 else b""
        ep_obj = payload.find(b"endobj", es if es >= 0 else data_start)
        pos = (ep_obj + 6) if ep_obj >= 0 else n
        if b"/Image" in params or b"/XObject" in params:
            continue  # image data, not page text
        try:
            content = _decode_stream(params, raw)
        except NotImplementedError:
            raise
        except Exception:
            continue  # undecodable non-content stream
        if b"BT" in content or b"Tj" in content or b"TJ" in content:
            t = _extract_text_from_content(content)
            if t:
                texts.append(t)
    return "\n".join(texts)


# --------------------------------------------------------------- encoder


def _escape_literal(s: bytes) -> bytes:
    out = bytearray()
    for b in s:
        if b in (0x28, 0x29, 0x5C):  # ( ) backslash
            out += b"\\" + bytes([b])
        elif b == 0x0A:
            out += b"\\n"
        elif b == 0x0D:
            out += b"\\r"
        else:
            out.append(b)
    return bytes(out)


def encode_pdf(
    lines: list[str],
    filter_: str = "flate",
    lines_per_page: int = 20,
    hex_strings: bool = False,
) -> bytes:
    """Minimal text PDF: catalog + page tree + one content stream per
    ``lines_per_page`` lines, each line a ``Td``-positioned ``Tj`` (or
    ``<hex> Tj`` when ``hex_strings``), streams Flate- or LZW-compressed
    or raw, with a classic xref table and trailer."""
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)  # 1-based object number

    pages = [
        lines[i : i + lines_per_page]
        for i in range(0, max(len(lines), 1), lines_per_page)
    ]
    content_ids = []
    page_ids_reserved = len(pages)
    # object numbering: 1=catalog, 2=pages, then per page (page, content)
    catalog_id, pages_id = 1, 2
    objs.append(b"")  # placeholder catalog
    objs.append(b"")  # placeholder pages
    kids = []
    for pg in pages:
        ops = [b"BT /F1 10 Tf"]
        for ln in pg:
            raw = ln.encode("latin-1", "replace")
            if hex_strings:
                ops.append(b"0 -12 Td <" + raw.hex().encode() + b"> Tj")
            else:
                ops.append(b"0 -12 Td (" + _escape_literal(raw) + b") Tj")
        ops.append(b"ET")
        content = b"\n".join(ops)
        if filter_ == "flate":
            enc = zlib.compress(content, 6)
            fdecl = b"/Filter /FlateDecode "
        elif filter_ == "lzw":
            from .tiff import _tiff_lzw_encode

            enc = _tiff_lzw_encode(content)
            fdecl = b"/Filter /LZWDecode "
        else:
            enc, fdecl = content, b""
        cid = add(
            b"<< "
            + fdecl
            + b"/Length "
            + str(len(enc)).encode()
            + b" >>\nstream\n"
            + enc
            + b"\nendstream"
        )
        content_ids.append(cid)
        pid = add(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents " + str(cid).encode() + b" 0 R >>"
        )
        kids.append(pid)
    objs[0] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[1] = (
        b"<< /Type /Pages /Count "
        + str(len(pages)).encode()
        + b" /Kids ["
        + b" ".join(f"{k} 0 R".encode() for k in kids)
        + b"] >>"
    )
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_off = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size "
        + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n"
        + str(xref_off).encode()
        + b"\n%%EOF\n"
    )
    return bytes(out)
