"""WARC parsing + HTML-strip pins beyond the oracle entry."""

from __future__ import annotations

import pytest

from simple_data_engineering_project_spark.operators.warc import (
    encode_warc,
    parse_warc,
    response_bodies,
)

PAGES = [
    ("http://a.example/1", b"<html><body><p>hello</p></body></html>"),
    ("http://a.example/2", b"<html><body><p>x" + b"y" * 500 + b"</p></body></html>"),
]


def test_record_walk_plain_and_gzipped():
    for gz in (False, True):
        p = encode_warc(PAGES, gzip_members=gz)
        recs = parse_warc(p)
        assert [r["type"] for r in recs] == [
            "request", "response", "metadata"] * 2
        bodies = response_bodies(p)
        assert [u for u, _ in bodies] == [u for u, _ in PAGES]
        assert [b for _, b in bodies] == [h for _, h in PAGES]


def test_payload_containing_warc_magic():
    # a response body that CONTAINS "WARC/1.0" — the walk must advance by
    # Content-Length, not by scanning for the next record marker
    evil = b"<html>WARC/1.0\r\nWARC-Type: fake\r\n\r\n</html>"
    p = encode_warc([("http://e/x", evil)])
    bodies = response_bodies(p)
    assert bodies == [("http://e/x", evil)]
    assert len(parse_warc(p)) == 3


def test_chunked_encoding_raises():
    msg = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n5\r\nhello\r\n0\r\n\r\n"
    )
    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n"
        + f"Content-Length: {len(msg)}\r\n\r\n".encode()
        + msg
        + b"\r\n\r\n"
    )
    with pytest.raises(NotImplementedError, match="chunked"):
        response_bodies(raw)
    with pytest.raises(ValueError):
        parse_warc(b"HTTP/1.1 not a warc")


def test_html_to_text_expression(spark):
    from pyspark.sql import functions as F

    from simple_data_engineering_project_spark.operators.text import (
        html_to_text,
    )

    cases = [
        # (html, expected)
        ("<html><head><title>T</title><style>p{}</style></head>"
         "<body><p>one</p><p>two</p></body></html>", "one\ntwo"),
        ("<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;</p>",
         'a & b <tag> "q" \'s\''),
        ("<div>x<br>y<br/>z</div>", "x\ny\nz"),
        ("<script>var a='<p>fake</p>';</script><p>real</p>", "real"),
        # escaped entity text survives the decode order exactly
        ("<p>literal &amp;lt; stays</p>", "literal &lt; stays"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "html string")
    got = [r[0] for r in df.select(html_to_text("html")).collect()]
    assert got == [e for _, e in cases]
