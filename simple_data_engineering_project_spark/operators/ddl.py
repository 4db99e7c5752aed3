"""Shared Spark-DDL helpers for the pure-format writers.

parquet_write and orc_write both parse ``array<...>`` / ``map<...>`` /
``struct<...>`` type strings; the comma split they share lives here so
a parsing fix cannot diverge between the two (round-11 review finding:
the split was duplicated and one copy missed the decimal(p,s) fix).
"""

from __future__ import annotations


def split_top(body: str) -> list[str]:
    """Split a DDL body on TOP-LEVEL commas only — commas inside
    decimal(p,s) or nested <> must not split fields (a naive split
    broke struct<a:decimal(10,2),...> mid-type and declined with a
    garbage type name)."""
    parts: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in body:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts
