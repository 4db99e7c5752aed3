"""Subtitle (SRT / WebVTT) parsing (SURVEY §2 C4/C5).

Video-text corpora (transcript alignment, caption mining) arrive as
SubRip ``.srt`` (numeric cue index, ``HH:MM:SS,mmm --> HH:MM:SS,mmm``
time line, text lines, blank separator) or WebVTT (``WEBVTT`` header,
dot milliseconds, no index lines). The PARSE runs entirely JVM-side as
column expressions (regexp_extract_all for the cue clock, a
regexp_replace chain for the text channel, zip_with + aggregate for
duration arithmetic — whole-stage codegen, zero Python in the parse
path); only the deterministic test-payload GENERATOR is an Arrow
batch.

:func:`subtitle_features` emits per-file (n_cues, total_cue_ms,
text_sha) where text_sha hashes the cue texts joined in order — the
transcript channel a caption-mining pipeline feeds downstream.
(∅ in reference; Tier C extension.)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import tokens


def _fmt_ts(ms: int, sep: str) -> str:
    h, rem = divmod(ms, 3_600_000)
    m, rem = divmod(rem, 60_000)
    s, mmm = divmod(rem, 1_000)
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{mmm:03d}"


def subs_from_documents(
    docs: DataFrame,
    words_per_cue: int = 5,
    cue_step_ms: int = 2000,
    cue_len_ms: int = 1500,
) -> DataFrame:
    """Deterministic subtitle table: each document's normalized words
    are cut into ``words_per_cue`` cues at ``cue_step_ms`` spacing;
    even ids render as SRT (comma millis + index lines), odd ids as
    WebVTT (header + dot millis). Returns (media_id, kind, sub_text)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, words in zip(pdf["doc_id"], pdf["__ws"]):
                did = int(doc_id)
                ws = list(words)
                cues = [
                    " ".join(ws[i : i + words_per_cue])
                    for i in range(0, len(ws), words_per_cue)
                ]
                vtt = did % 2 == 1
                sep = "." if vtt else ","
                parts = ["WEBVTT", ""] if vtt else []
                for i, cue in enumerate(cues):
                    if not vtt:
                        parts.append(str(i + 1))
                    t0 = i * cue_step_ms
                    parts.append(
                        f"{_fmt_ts(t0, sep)} --> {_fmt_ts(t0 + cue_len_ms, sep)}"
                    )
                    parts.append(cue)
                    parts.append("")
                rows.append(
                    {
                        "media_id": did,
                        "kind": "vtt" if vtt else "srt",
                        "sub_text": "\n".join(parts),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "sub_text"])

    src = docs.select(
        "doc_id", F.filter(tokens("text"), lambda t: t != "").alias("__ws")
    ).filter(F.size("__ws") > 0)
    return src.mapInPandas(
        _gen, schema="media_id long, kind string, sub_text string"
    )


_TS = r"(\d{2}:\d{2}:\d{2}[,.]\d{3})"


def _ms(col):
    """'HH:MM:SS,mmm' or dot-millis -> milliseconds, pure expressions."""
    return (
        F.substring(col, 1, 2).cast("long") * 3_600_000
        + F.substring(col, 4, 2).cast("long") * 60_000
        + F.substring(col, 7, 2).cast("long") * 1_000
        + F.substring(col, 10, 3).cast("long")
    )


def subtitle_features(subs: DataFrame) -> DataFrame:
    """(media_id, n_cues, total_cue_ms, text_sha) via a pure-expression
    parse of the SRT/VTT structure."""
    # NOTE: F.expr string literals eat backslashes (SQL escaping) — the
    # Python function with a lit() pattern keeps the regex intact
    starts = F.regexp_extract_all(
        "sub_text", F.lit(f"{_TS} -->"), F.lit(1)
    )
    ends = F.regexp_extract_all("sub_text", F.lit(f"--> {_TS}"), F.lit(1))
    durations = F.zip_with(starts, ends, lambda s, e: _ms(e) - _ms(s))
    text = F.regexp_replace(F.col("sub_text"), r"(?m)^WEBVTT\n+", "")
    text = F.regexp_replace(
        text, r"(?m)^\d+\n(?=\d{2}:\d{2}:\d{2})", ""
    )  # SRT cue-index lines (only when a time line follows)
    text = F.regexp_replace(
        text,
        r"(?m)^\d{2}:\d{2}:\d{2}[,.]\d{3} --> "
        r"\d{2}:\d{2}:\d{2}[,.]\d{3}\n",
        "",
    )
    text = F.trim(F.regexp_replace(text, r"\n+", " "))
    return subs.select(
        "media_id",
        F.size(starts).alias("n_cues"),
        F.aggregate(
            durations, F.lit(0).cast("long"), lambda a, d: a + d
        ).alias("total_cue_ms"),
        F.sha2(text, 256).alias("text_sha"),
    )
