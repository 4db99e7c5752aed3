"""Pin the executor package-visibility path (session.ensure_package_on_executors).

Arrow UDFs in this package pickle by module reference, so Python
workers must import the package. Round-7 regression class: every
Arrow-UDF catalog entry fails with worker ModuleNotFoundError when the
driver launches outside the repo root and nothing ships the package to
workers. The mechanism is probe-first: an import probe task decides
whether shipping is needed at all (repo-root launches must stay
file-free — a shipped file bills its dependency-sync check to every
task), and the shipped zip carries PRECOMPILED .pyc so workers never
re-parse the 25k-LoC tree. (PYTHONPATH exported after session start
does NOT reach worker daemons — the JVM captured its environment
earlier — which is why the probe/zip design exists.)
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

from simple_data_engineering_project_spark import session as sess


def test_probe_detects_importable_workers(spark):
    # repo-root launch (this suite): workers import via their cwd, so
    # the probe must say yes and no file may be shipped
    assert sess._workers_can_import(spark.sparkContext)
    assert spark.sparkContext.applicationId in sess._SHIPPED


def test_zip_builder_ships_precompiled_package():
    zpath = sess.build_package_zip()
    names = zipfile.ZipFile(zpath).namelist()
    assert "simple_data_engineering_project_spark/session.pyc" in names
    assert "simple_data_engineering_project_spark/plans/catalog.pyc" in names
    assert all(n.endswith(".pyc") for n in names)


def test_worker_import_from_hostile_cwd_end_to_end():
    """The real failure scenario, reproduced in a subprocess: driver
    launched from /tmp runs an Arrow UDF defined in the package. Only
    the probe→addPyFile path can make the worker import succeed."""
    script = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false")
         .appName("hostile-cwd-probe").getOrCreate())
from simple_data_engineering_project_spark.session import (
    ensure_package_on_executors, _workers_can_import)
assert not _workers_can_import(spark.sparkContext), "probe should fail from /tmp"
ensure_package_on_executors(spark)
# an Arrow UDF whose module lives in the package must now run
from simple_data_engineering_project_spark.operators.text import quality_features
df = spark.createDataFrame([(1, "the quick brown fox and the lazy dog")],
                           "doc_id long, text string")
rows = quality_features(df).collect()
assert rows[0]["n_tokens"] == 8, rows
# and a worker-side import through the shipped zip
def probe(_):
    import simple_data_engineering_project_spark.operators.arrow_ipc as m
    return [m.__file__]
(loc,) = spark.sparkContext.parallelize([0], 1).mapPartitions(probe).collect()
print("WORKER_IMPORT_OK", loc)
"""
    out = subprocess.run(
        [sys.executable, "-c", script],
        cwd="/tmp",
        capture_output=True,
        text=True,
        timeout=300,
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert "WORKER_IMPORT_OK" in out.stdout, (out.stdout[-2000:],
                                              out.stderr[-2000:])
