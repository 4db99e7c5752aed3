"""Offline cProfile of the pure-codec inner loops (no Spark).

Usage: python scripts/profile_codecs.py [entry ...]

Profiles the executor-side work of the pure-format scan/sink family
directly: the sink entries' per-batch derive+encode(+decode-verify)
path on a representative Arrow-batch-sized slice of real orders keys,
and the scan entries' per-file decode+flatten path on the already-
staged fixture files under $SPARK_GRAFT_SCRATCH. Prints the top
cumulative frames per entry so the hot loop is named before anything
is rewritten (guide §1: measure first).
"""

from __future__ import annotations

import cProfile
import glob
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH", "/tmp/sdep_spark_scratch")
TAG = os.path.basename(os.path.normpath(SF_DIR))


def _orders_keys(n=20000):
    t = pq.read_table(f"{SF_DIR}/orders.parquet", columns=["o_orderkey"])
    return [int(x) for x in t.column("o_orderkey").to_pylist()[:n]]


def _docs_batch(n=5000):
    t = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    import pandas as pd

    return t.slice(0, n).to_pandas()


def profile(label, fn, runs=1):
    pr = cProfile.Profile()
    t0 = time.time()
    pr.enable()
    for _ in range(runs):
        fn()
    pr.disable()
    wall = time.time() - t0
    print(f"\n===== {label}: {wall:.3f}s ({runs} run) =====")
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(18)


def main():
    import importlib

    C = importlib.import_module(
        "simple_data_engineering_project_spark.plans.catalog"
    )
    from simple_data_engineering_project_spark.operators.parquet_write import (
        build_parquet_bytes,
    )
    from simple_data_engineering_project_spark.operators.orc_write import (
        build_orc_bytes,
    )
    from simple_data_engineering_project_spark.operators import (
        parquet_data,
        orc_data,
    )

    want = set(sys.argv[1:])

    def on(name):
        return not want or name in want

    keys = _orders_keys()
    print(f"keys: {len(keys)} orders keys from {SF_DIR}")

    # ---- sink nested5 ----
    if on("sink_parquet_nested5") or on("sink_orc_nested5"):
        mss, mls = C._nested5_python_values(keys)

        if on("sink_parquet_nested5"):
            profile(
                "nested5 derive (python values)",
                lambda: C._nested5_python_values(keys),
            )
            profile(
                "sink_parquet_nested5 encode",
                lambda: build_parquet_bytes(
                    {"o_orderkey": keys, "ms": mss, "ml": mls},
                    C._NESTED5_DDL,
                    compression="snappy",
                    page_version=2,
                ),
            )
            payload = build_parquet_bytes(
                {"o_orderkey": keys, "ms": mss, "ml": mls},
                C._NESTED5_DDL,
                compression="snappy",
                page_version=2,
            )
            profile(
                "sink_parquet_nested5 decode (pyarrow+flatten)",
                lambda: C._nested5_sink_decode(
                    pq.read_table(io.BytesIO(payload))
                ),
            )
        if on("sink_orc_nested5"):
            profile(
                "sink_orc_nested5 encode",
                lambda: build_orc_bytes(
                    {"o_orderkey": keys, "ms": mss, "ml": mls},
                    C._NESTED5_DDL,
                    compression="zlib",
                ),
            )

    # ---- sink nested6 ----
    if on("sink_parquet_nested6") or on("sink_orc_nested6"):
        llls, mms = C._nested6_python_values(keys)
        if on("sink_parquet_nested6"):
            profile(
                "nested6 derive (python values)",
                lambda: C._nested6_python_values(keys),
            )
            profile(
                "sink_parquet_nested6 encode",
                lambda: build_parquet_bytes(
                    {"o_orderkey": keys, "lll": llls, "mm": mms},
                    C._NESTED6_DDL,
                    compression="snappy",
                    page_version=2,
                ),
            )
        if on("sink_orc_nested6"):
            profile(
                "sink_orc_nested6 encode",
                lambda: build_orc_bytes(
                    {"o_orderkey": keys, "lll": llls, "mm": mms},
                    C._NESTED6_DDL,
                    compression="zlib",
                ),
            )

    # ---- scan nested5/6 + pure decodes over staged fixtures ----
    scans = {
        "scan_parquet_nested5": (
            f"{SCRATCH}/{TAG}/pq_nested5_orders/part-*.parquet",
            lambda p: parquet_data.read_parquet_nested_columns(
                p, ["o_orderkey", "ms", "ml"]
            ),
        ),
        "scan_orc_nested5": (
            f"{SCRATCH}/{TAG}/orc_nested5_orders/part-*.orc",
            lambda p: orc_data.read_orc_nested_columns(
                p, ["o_orderkey", "ms", "ml"]
            ),
        ),
        "scan_parquet_nested6": (
            f"{SCRATCH}/{TAG}/pq_nested6_orders/part-*.parquet",
            lambda p: parquet_data.read_parquet_nested_columns(
                p, ["o_orderkey", "lll", "mm"]
            ),
        ),
        "scan_orc_nested6": (
            f"{SCRATCH}/{TAG}/orc_nested6_orders/part-*.orc",
            lambda p: orc_data.read_orc_nested_columns(
                p, ["o_orderkey", "lll", "mm"]
            ),
        ),
        "scan_parquet_pure": (
            f"{SF_DIR}/orders.parquet",
            lambda p: parquet_data.read_parquet_nested_columns(
                p,
                ["o_orderkey", "o_custkey", "o_orderstatus",
                 "o_totalprice", "o_orderpriority"],
            ),
        ),
        "scan_orc_pure": (
            f"{SCRATCH}/{TAG}/orc_pure_orders/part-*.orc",
            lambda p: orc_data.read_orc_columns(
                p,
                ["o_orderkey", "o_custkey", "o_orderstatus",
                 "o_totalprice", "o_orderpriority"],
            ),
        ),
    }
    for name, (pat, rd) in scans.items():
        if not on(name) or rd is None:
            continue
        paths = sorted(glob.glob(pat))
        if not paths:
            print(f"\n===== {name}: fixture not staged ({pat}) — skip")
            continue
        # profile ~4 files (one task's worth at 32-wide staging)
        sel = paths[: max(1, min(4, len(paths)))]
        profile(
            f"{name} decode x{len(sel)} files",
            lambda sel=sel, rd=rd: [rd(p) for p in sel],
        )

    # ---- pure sink over documents ----
    if on("sink_parquet_pure"):
        b = _docs_batch()
        profile(
            "sink_parquet_pure encode",
            lambda: build_parquet_bytes(
                {
                    "doc_id": [int(x) for x in b["doc_id"]],
                    "lang": list(b["lang"]),
                    "text": list(b["text"]),
                },
                {"doc_id": "bigint", "lang": "string", "text": "string"},
                compression="snappy",
            ),
        )


if __name__ == "__main__":
    main()
