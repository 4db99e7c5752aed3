"""Dump .explain("formatted") for catalog entries to plans/$SDEP_PLAN_ROUND (default r16).

Usage: python scripts/plan_dump.py <suffix> [entry ...]
  suffix: "before" or "after" (file name becomes <entry>_<suffix>.txt)
  entries: default = every HEADLINE entry in bench.py

explain() only plans (no execution), so this is cheap; entries whose
builder itself stages fixtures or runs jobs (sinks, scans with staged
inputs) still pay that staging cost once.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SDEP_PLAN_ROUND", "r16"),
)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    from bench import HEADLINE

    from simple_data_engineering_project_spark.plans import catalog
    from simple_data_engineering_project_spark.session import get_spark

    if not names:
        names = list(HEADLINE)
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="sdep-plan-dump", cpus=CPUS)
    cat = catalog()
    for name in names:
        try:
            df = cat[name].fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - record, keep going
            plan = f"PLAN DUMP FAILED: {type(exc).__name__}: {exc}"
        with open(os.path.join(OUT_DIR, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok" if not plan.startswith("PLAN DUMP FAILED") else "FAIL")


if __name__ == "__main__":
    main()
