"""Reusable column expressions — built-ins only, JVM-side, codegen-friendly.

Design rule (SURVEY §2 C13): the hot path uses ``pyspark.sql.functions``
exclusively so every expression stays inside whole-stage codegen; Python
UDFs appear only in the multimodal stubs where no builtin can exist.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schemas import PRICE_PER_KG_USD


def revenue() -> Column:
    """The testdata transposition of the reference's shipment value:
    ``l_extendedprice * (1 - l_discount)`` (FIXTURES.md §3)."""
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def shipment_value_usd(weight_col: str = "shipment_weight_kg") -> Column:
    """``round(weight * 2.50, 2)`` (cocoa_processing_dag.py:24,193).

    Exact for integral weights (int × 2.5 has ≤1 decimal), so HALF_UP vs
    half-even rounding cannot diverge — the boundary the reference silently
    relies on, kept explicit here and pinned by a unit test.
    """
    return F.round(F.col(weight_col) * F.lit(PRICE_PER_KG_USD), 2)


def normalized_text(col: str = "text") -> Column:
    """Lowercase, strip non-alphanumerics to single spaces, trim.

    The shared normalization for tokenization, fingerprints, and shingles
    so every text operator agrees on what a token is.
    """
    return F.trim(F.regexp_replace(F.lower(F.col(col)), r"[^a-z0-9]+", " "))


def tokens(col: str = "text") -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalized_text(col), r" ")


def doc_fingerprint(col: str = "text") -> Column:
    """Deterministic content fingerprint: md5 of normalized text.

    Content-addressed identity for exact dedup and incremental reprocessing;
    md5 keeps it oracle-checkable (DuckDB md5 produces identical hex).
    """
    return F.md5(normalized_text(col))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<numeric> columns, JVM-side.

    ``zip_with`` + ``aggregate`` fold sequentially in codegen — no Python,
    no shuffle, deterministic summation order (matches the DuckDB oracle's
    ``list_dot_product`` to double precision). Inputs are cast to double
    first so float32 testdata accumulates in float64 on both engines.
    """
    ad = a.cast("array<double>")
    bd = b.cast("array<double>")
    dot = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)



def hash_split(
    key: Column, train_pct: int = 80, val_pct: int = 10
) -> Column:
    """Deterministic train/val/test assignment from an integer key.

    Knuth multiplicative hash in plain integer arithmetic — identical
    in any engine and stable across runs/layouts, unlike ``rand()``
    splits which shift with partitioning. The key folds mod a prime
    first so the product stays < 2^62 under ANSI overflow checking.
    Buckets: [0, train_pct) train, [train_pct, train_pct+val_pct) val,
    rest test.
    """
    bucket = F.pmod(
        F.pmod((key % 1000003) * F.lit(2654435761), F.lit(4294967296)),
        F.lit(100),
    )
    return (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )

def bigrams(col: str = "text") -> Column:
    """Word-bigram array of the normalized text (array<string>).

    Built with ``zip_with`` over two slices of the token array so the
    tokenization (regexp + split) evaluates ONCE per row. Referencing
    the token expression inside a ``transform`` lambda instead
    re-evaluates it per element — O(tokens²) regex work per document,
    measured 25× slower at sf0.1.
    """
    toks = tokens(col)
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, m),
        F.slice(toks, 2, m),
        lambda x, y: F.concat_ws(" ", x, y),
    )


def _spread_bits_16(x: Column) -> Column:
    """Interleave zeros between the low 16 bits of ``x`` (morton spread).

    The classic magic-number spread — four shift/or/mask rounds, all
    exact int64 ops (identical in any engine, no overflow under ANSI:
    values stay < 2^32).
    """
    x = x.bitwiseAND(F.lit(0xFFFF))
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def zorder_key(a: Column, b: Column) -> Column:
    """2-D Z-order (morton) key over the low 16 bits of two integer
    columns: bit i of ``a`` lands at position 2i, of ``b`` at 2i+1.

    Sorting by this key before a columnar write co-locates rows that are
    close in BOTH dimensions, so parquet row-group min/max stats become
    tight boxes and a 2-D range predicate skips most row groups — the
    data-layout optimization lakehouses apply to multi-dimension filter
    workloads where sorting by one column destroys locality of the
    other. Pure integer expression: usable in any engine, oracle-exact.
    """
    return _spread_bits_16(a).bitwiseOR(F.shiftleft(_spread_bits_16(b), 1))


__all__ = [
    "bigrams",
    "hash_split",
    "zorder_key",
    "revenue",
    "shipment_value_usd",
    "normalized_text",
    "tokens",
    "doc_fingerprint",
    "cosine_similarity",
]
