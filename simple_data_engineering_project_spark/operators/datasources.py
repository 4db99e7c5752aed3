"""Custom Python DataSources (Spark 4 ``pyspark.sql.datasource`` API)
— SURVEY §2 A10/C4.

Spark 4 lets an engine expose NEW formats through the planner itself:
``spark.dataSource.register(...)`` + ``spark.read.format("warcshards")``
gives a custom format real InputPartitions (one per shard file here, so
a 100 TB crawl fans out file-per-task exactly like the built-in file
sources), catalyst-visible schemas, and ordinary downstream pushdown on
the returned columns — strictly more integrated than a
binaryFile-plus-mapInPandas chain, and the idiomatic way to ship a
connector for a format Spark lacks.

``WarcShardDataSource`` reads directories of WARC shards through
:mod:`.warc`'s Content-Length-driven record walk (per-member gunzip,
HTTP response unwrap) and emits one row per response record:
(uri string, html string). The class lives in this importable module so
executors can unpickle it. (∅ in reference; Tier C extension.)
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class WarcShardDataSource(DataSource):
    """``spark.read.format("warcshards").option("path", dir)`` — one
    InputPartition per ``*.warc`` file."""

    @classmethod
    def name(cls) -> str:
        return "warcshards"

    def schema(self) -> str:
        return "uri string, html string"

    def reader(self, schema) -> "WarcShardReader":
        return WarcShardReader(self.options["path"])


class WarcShardReader(DataSourceReader):
    def __init__(self, path: str) -> None:
        self.path = path

    def partitions(self):
        files = sorted(glob.glob(os.path.join(self.path, "*.warc")))
        if not files:
            raise FileNotFoundError(f"no .warc shards under {self.path}")
        return [InputPartition(f) for f in files]

    # flush an Arrow batch once buffered page bytes cross this bound, so
    # peak executor memory per task stays capped on multi-GB shards
    # instead of materializing one batch per whole file
    BATCH_BYTES = 64 * 1024 * 1024

    def read(self, partition):
        # Arrow RecordBatches (the API's batch path — row tuples would
        # cross the Python/JVM boundary one at a time), chunked by byte
        # budget rather than one batch per shard file.
        import pyarrow as pa

        from .warc import response_bodies

        with open(partition.value, "rb") as f:
            payload = f.read()

        def batch(uris, htmls):
            return pa.RecordBatch.from_arrays(
                [
                    pa.array(uris, type=pa.string()),
                    pa.array(htmls, type=pa.string()),
                ],
                names=["uri", "html"],
            )

        uris, htmls, buffered = [], [], 0
        for uri, body in response_bodies(payload):
            uris.append(uri)
            htmls.append(body.decode("latin-1"))
            buffered += len(body) + len(uri)
            if buffered >= self.BATCH_BYTES:
                yield batch(uris, htmls)
                uris, htmls, buffered = [], [], 0
        if uris:
            yield batch(uris, htmls)
