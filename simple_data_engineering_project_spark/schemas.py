"""Explicit schemas — the engine never relies on inference in the data path.

Two families:

1. The cocoa-shipment contract of the reference pipeline. The reference
   infers types with ``pd.read_csv`` (cocoa_processing_dag.py:182) and lets
   PostgreSQL coerce on COPY; we declare the StructType up front so CSV
   scans are single-pass, vectorized, and fail loudly on type drift.
   Column set and domains: cocoa_processing_dag.py:26-35 (required set),
   scripts/generate_data.py:29-43 (value domains).

2. The driver test tables (TESTDATA.md). Parquet carries its own schema;
   these are used for CSV round-trip operators and for test assertions.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- cocoa landing contract (reference required columns, dag.py:26-35) ---

COCOA_LANDING_SCHEMA = T.StructType(
    [
        T.StructField("shipment_id", T.StringType(), nullable=False),
        T.StructField("timestamp", T.TimestampType(), nullable=False),
        T.StructField("farm_id", T.StringType(), nullable=True),
        T.StructField("region", T.StringType(), nullable=True),
        T.StructField("bean_type", T.StringType(), nullable=True),
        T.StructField("quality_score", T.DoubleType(), nullable=True),
        T.StructField("shipment_weight_kg", T.DoubleType(), nullable=True),
        # 10% null in the generator (generate_data.py:40-41)
        T.StructField("temperature_celsius", T.DoubleType(), nullable=True),
    ]
)

REQUIRED_COCOA_COLUMNS = frozenset(f.name for f in COCOA_LANDING_SCHEMA.fields)

# enriched = landing + derived value + audit stamp (dag.py:193-194)
COCOA_ENRICHED_SCHEMA = T.StructType(
    list(COCOA_LANDING_SCHEMA.fields)
    + [
        T.StructField("shipment_value_usd", T.DoubleType(), nullable=True),
        T.StructField("processed_at", T.TimestampType(), nullable=True),
    ]
)

PRICE_PER_KG_USD = 2.50  # dag.py:24

# Reference generator domains (generate_data.py:13-21)
COCOA_REGIONS = [
    "Ashanti", "Brong-Ahafo", "Volta", "Eastern", "Western", "Central",
    "Greater Accra", "Northern", "Upper East", "Upper West", "Western North",
    "Oti", "Bono East", "Ahafo", "Savannah", "North East",
]
BEAN_TYPES = ["Forastero", "Criollo", "Trinitario"]

# --- driver test tables (TESTDATA.md / FIXTURES.md §2) ---

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES = tuple(TESTDATA_SCHEMAS)
