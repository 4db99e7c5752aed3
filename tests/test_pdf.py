"""PDF extractor pins beyond the oracle entry: escape rules, marker
lookalikes inside compressed streams, TJ arrays, envelope raises."""

from __future__ import annotations

import pytest

from simple_data_engineering_project_spark.operators.pdf import (
    _extract_text_from_content,
    encode_pdf,
    extract_pdf_text,
)


def _roundtrip(lines, **kw):
    got = extract_pdf_text(encode_pdf(lines, **kw))
    assert got == "\n".join(l for l in lines if l), kw


def test_filters_and_string_syntaxes():
    lines = ["hello world", "second line", "third (with) parens", "x" * 40]
    for filt in ("flate", "lzw", "raw"):
        for hx in (False, True):
            _roundtrip(lines, filter_=filt, hex_strings=hx, lines_per_page=2)


def test_escapes_and_special_bytes():
    _roundtrip(["parens (nested (deep)) and \\ backslash"])
    _roundtrip(["tab\there", "embedded\nnewline", "cr\rchar"])
    _roundtrip(["café latin-1 résumé"])  # latin-1 byte round trip


def test_marker_lookalikes_inside_text():
    # the words a naive object scanner trips on — as CONTENT they must
    # survive every filter, including raw (uncompressed) streams whose
    # bytes literally contain them
    lines = ["this endobj is text", "fake 7 0 obj header", "endstream here",
             "operators Tj TJ BT ET T*"]
    for filt in ("flate", "lzw", "raw"):
        _roundtrip(lines, filter_=filt)


def test_tj_array_and_quote_operator():
    # hand-built content stream: TJ arrays interleave strings with
    # kerning numbers; ' shows on the next line
    content = b"BT /F1 10 Tf 0 -12 Td [(Hel) -20 (lo)] TJ (world) ' ET"
    assert _extract_text_from_content(content) == "Hello\nworld"


def test_octal_and_continuation_escapes():
    content = b"BT 0 -12 Td (A\\101\\12B) Tj 0 -12 Td (cont\\\ninued) Tj ET"
    # \101 = 'A', \12 = LF, backslash-newline = continuation (dropped)
    assert _extract_text_from_content(content) == "AA\nB\ncontinued"


def test_multi_page_concatenation():
    lines = [f"line {i:03d} of the document" for i in range(23)]
    _roundtrip(lines, lines_per_page=4)


def test_envelope_rejections():
    p = bytearray(encode_pdf(["secret"]))
    i = p.index(b"/Type /Catalog")
    p[i : i + 14] = b"/Encrypt 9 0 R"
    with pytest.raises(NotImplementedError, match="encrypted"):
        extract_pdf_text(bytes(p))
    with pytest.raises(ValueError):
        extract_pdf_text(b"%!PS not a pdf")
