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


def test_equal_mtime_pyc_is_recompiled(tmp_path):
    """ADVICE r8 #2: an equal-mtime cache must NOT be trusted — a source
    edit within mtime granularity would ship stale bytecode."""
    src = tmp_path / "m.py"
    src.write_text("X = 1\n")
    import importlib.util
    import py_compile

    cached = py_compile.compile(str(src), doraise=True)
    assert cached == importlib.util.cache_from_source(str(src))
    # strictly newer cache → fresh
    later = os.path.getmtime(str(src)) + 10
    os.utime(cached, (later, later))
    assert sess._pyc_is_fresh(str(src), cached)
    # EQUAL mtimes → stale (the round-8 fix: <= not <)
    t = os.path.getmtime(str(src))
    os.utime(cached, (t, t))
    assert not sess._pyc_is_fresh(str(src), cached)
    # cache older than source → stale; missing cache → stale
    os.utime(cached, (t - 10, t - 10))
    assert not sess._pyc_is_fresh(str(src), cached)
    os.remove(cached)
    assert not sess._pyc_is_fresh(str(src), cached)


def test_cluster_master_ships_without_probe(monkeypatch, tmp_path):
    """ADVICE r8 #3: on a NON-local master the one-task probe job would
    block session creation on dynamic-allocation clusters with no warm
    executor — the zip must ship unconditionally, probe never run."""
    shipped = []

    class _FakeSC:
        master = "spark://cluster:7077"
        applicationId = "app-fake-cluster-0001"

        def addPyFile(self, path):
            shipped.append(path)

    class _FakeSpark:
        sparkContext = _FakeSC()

    def _boom(sc):
        raise AssertionError("probe job must not run on a cluster master")

    monkeypatch.setattr(sess, "_workers_can_import", _boom)
    zpath = str(tmp_path / "pkg.zip")
    open(zpath, "wb").close()
    monkeypatch.setattr(sess, "build_package_zip", lambda: zpath)
    sess._SHIPPED.discard(_FakeSC.applicationId)
    try:
        sess.ensure_package_on_executors(_FakeSpark())
        assert shipped == [zpath]
        # idempotent per application id
        sess.ensure_package_on_executors(_FakeSpark())
        assert shipped == [zpath]
    finally:
        sess._SHIPPED.discard(_FakeSC.applicationId)


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
