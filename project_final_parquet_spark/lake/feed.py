"""``lakefeed``: the snapshot log as a Spark Data Source.

Batch: ``spark.read.format("lakefeed").option("path", root)`` scans the
CURRENT snapshot's live files, one input partition per file.

Streaming: ``spark.readStream.format("lakefeed")`` follows the log —
the offset IS the lake version, so each micro-batch is exactly the
``data_change`` files committed since the last consumed version, and
recovery replay (``readBetweenOffsets``) re-reads an immutable manifest
range — deterministic by construction, stronger than file-listing
offsets (the round-4 reffile source's count-of-files offsets rely on
sorted listing; version offsets name snapshots). Compaction commits
(``data_change=False``) are invisible to the feed: rewritten rows are
never re-emitted (tests/test_lake_feed.py).

Everything that crosses into a data-source worker is defined inside
the factory function, so cloudpickle ships it by value — the driver's
sys.path hack does not reach Python worker processes (the round-4
lesson, see operators/reffile_source.py module docstring).

Like the reffile source, the Simple stream reader fetches driver-side
(right for micro-batch-sized commits); the partition-parallel
``streamReader`` with the same version offsets is the production
upgrade path.
"""

from __future__ import annotations


def make_lakefeed_datasource():
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    import json
    import os

    def _versions(root: str) -> list[int]:
        log = os.path.join(root, "_log")
        if not os.path.isdir(log):
            return []
        return sorted(
            int(f[1:-5])
            for f in os.listdir(log)
            if f.startswith("v") and f.endswith(".json")
        )

    def _manifest(root: str, version: int) -> list[dict]:
        if version == 0:
            return []
        with open(os.path.join(root, "_log", f"v{version}.json")) as f:
            return json.load(f)["files"]

    def _current(root: str) -> int:
        vs = _versions(root)
        return vs[-1] if vs else 0

    _PA_TO_SPARK = {
        "int64": "BIGINT",
        "int32": "INT",
        "double": "DOUBLE",
        "float": "FLOAT",
        "string": "STRING",
        "large_string": "STRING",
        "bool": "BOOLEAN",
        "date32[day]": "DATE",
        "binary": "BINARY",
        "large_binary": "BINARY",
    }

    def _ddl(root: str) -> str:
        import pyarrow.parquet as pq

        entries = _manifest(root, _current(root))
        if not entries:
            raise ValueError(f"empty lake table at {root}")
        # newest-added entry carries the evolved (widest) schema;
        # older files' missing columns surface as NULL
        newest = max(entries, key=lambda e: e["added"])
        schema = pq.read_schema(newest["path"])
        parts = []
        for field in schema:
            t = str(field.type)
            if t.startswith("timestamp[") and "tz=" not in t:
                spark_t = "TIMESTAMP_NTZ"
            elif t.startswith("timestamp["):
                spark_t = "TIMESTAMP"
            else:
                spark_t = _PA_TO_SPARK.get(t)
            if spark_t is None:
                raise ValueError(f"unsupported lakefeed type {t}")
            parts.append(f"`{field.name}` {spark_t}")
        return ", ".join(parts)

    def _rows_of(path: str, fields: list[str]) -> list[tuple]:
        import pyarrow.parquet as pq

        # schema evolution: files older than an added column don't have
        # it — read what's present, surface the rest as NULL
        present = set(pq.read_schema(path).names)
        tbl = pq.read_table(
            path, columns=[f for f in fields if f in present]
        )
        cols = [
            tbl.column(f).to_pylist()
            if f in present
            else [None] * tbl.num_rows
            for f in fields
        ]
        return list(zip(*cols)) if cols else []

    class LakeFeedReader(DataSourceReader):
        def __init__(self, options: dict, fields: list[str]):
            self.root = options["path"]
            self.fields = fields

        def partitions(self):
            entries = _manifest(self.root, _current(self.root))
            return [InputPartition(e["path"]) for e in entries]

        def read(self, partition):
            yield from _rows_of(partition.value, self.fields)

    class LakeFeedStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options: dict, fields: list[str]):
            self.root = options["path"]
            self.fields = fields
            self.start_version = int(options.get("startingVersion", 0))

        def initialOffset(self) -> dict:
            return {"version": self.start_version}

        def _batch(self, since: int, to: int) -> list[tuple]:
            out: list[tuple] = []
            for e in _manifest(self.root, to):
                if since < e["added"] <= to and e.get(
                    "data_change", True
                ):
                    out.extend(_rows_of(e["path"], self.fields))
            return out

        def read(self, start: dict):
            to = _current(self.root)
            if to <= start["version"]:
                return iter([]), start
            return iter(self._batch(start["version"], to)), {
                "version": to
            }

        def readBetweenOffsets(self, start: dict, end: dict):
            # recovery replay: manifests are immutable, so a version
            # range names the exact same rows forever
            return iter(self._batch(start["version"], end["version"]))

    class LakeFeedDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "lakefeed"

        def schema(self):
            return _ddl(self.options["path"])

        def reader(self, schema) -> DataSourceReader:
            return LakeFeedReader(
                self.options, [f.name for f in schema.fields]
            )

        def simpleStreamReader(self, schema):
            return LakeFeedStreamReader(
                self.options, [f.name for f in schema.fields]
            )

    return LakeFeedDataSource


LakeFeedDataSource = make_lakefeed_datasource()


def register_lakefeed(spark) -> None:
    """Idempotently register the lakefeed source with a session."""
    spark.dataSource.register(make_lakefeed_datasource())
