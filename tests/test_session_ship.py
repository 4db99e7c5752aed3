"""Pin the executor package-shipping path (session.ensure_package_on_executors).

Arrow UDFs in this package pickle by module reference, so Python
workers must import the package. On a cluster (or a harness launched
from an arbitrary cwd) that only works because the session layer ships
a zip of the package via addPyFile. Round-7 regression class: every
Arrow-UDF catalog entry fails with worker ModuleNotFoundError when
this path breaks.
"""

from __future__ import annotations

import os
import zipfile

from simple_data_engineering_project_spark import session as sess


def test_package_zip_ships_once_per_app(spark):
    app_id = spark.sparkContext.applicationId
    # get_spark in conftest already shipped; the guard must record it
    assert app_id in sess._SHIPPED
    zpath = os.path.join("/tmp", f"sdep_spark_pyfiles_{os.getpid()}.zip")
    assert os.path.exists(zpath)
    names = zipfile.ZipFile(zpath).namelist()
    assert "simple_data_engineering_project_spark/session.py" in names
    assert "simple_data_engineering_project_spark/plans/catalog.py" in names
    # idempotent: calling again must not re-register (addPyFile twice
    # with changed contents would fail the app)
    before = set(sess._SHIPPED)
    sess.ensure_package_on_executors(spark)
    assert sess._SHIPPED == before


def test_worker_side_package_import(spark):
    # Prove an executor Python can import the package through the
    # shipped zip alone: strip repo paths from the worker's sys.path
    # before importing (workers inherit no repo cwd on a real cluster).
    def probe(it):
        import importlib
        import sys

        sys.modules.pop("simple_data_engineering_project_spark", None)
        repo_like = [
            p
            for p in sys.path
            if p in ("", ".", "/root/repo")
        ]
        for p in repo_like:
            sys.path.remove(p)
        try:
            m = importlib.import_module(
                "simple_data_engineering_project_spark"
            )
            yield os.path.basename(os.path.dirname(m.__file__))
        finally:
            sys.path[:0] = repo_like

    got = (
        spark.sparkContext.parallelize([1], 1).mapPartitions(probe).collect()
    )
    assert got == ["simple_data_engineering_project_spark"]
