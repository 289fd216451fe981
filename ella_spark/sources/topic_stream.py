"""Exact-offset streaming source for topics (PySpark Python DataSource).

The built-in file stream source tracks *seen file names* in its own
log: every new file is new input, so a compacted (merged) shard would
be re-delivered wholesale, and offsets aren't meaningful positions in
the topic. This source instead treats the topic's shard log itself as
the offset axis — the reference's subscriber-queue semantics
(ella-engine/src/table/channel.rs:250-331: a subscriber owns a cursor
into the ordered feed) — implemented with the Spark 4 Python
DataSource streaming API instead of a custom channel runtime.

Design:
- Shards are immutable and their basenames embed the publish-time
  ``time_ns`` (topic.py Publisher.flush), so **basename order is
  publish order** across all ``__bucket=*`` partition dirs. An offset
  is simply ``{"watermark": <last delivered basename>}``.
- ``latestOffset`` lists the shard log; ``partitions(start, end)``
  yields one ``InputPartition`` per shard in ``(start, end]`` —
  deterministic replay from any checkpointed offset range.
- ``read`` runs on executors and yields Arrow batches straight from
  the shard (zero row-by-row Python), cast to the declared Spark
  schema (unsigned parquet types widen exactly like the batch path).
- Compacted shards re-use their earliest input's timestamp prefix
  (maintenance.py), sorting *below* a caught-up watermark: live
  subscribers skip them — no re-delivery, unlike the file source.
  (A subscriber restarting from a checkpoint that predates compaction
  replays merged data at-least-once; full exactly-once under
  compaction still requires a quiesced topic.)

Scale: ``latestOffset``/``partitions`` do one directory listing on the
driver per trigger (same as the file source); data moves executor-side
as Arrow. One Spark task per shard — compaction keeps shard count
bounded, which is also what keeps listing cheap at 100 TB.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

SOURCE_NAME = "ella_topic"


def _list_shards(topic_dir: str) -> list[tuple[str, str]]:
    """(basename, full_path) for every committed shard, publish order."""
    root = Path(topic_dir)
    out = [
        (p.name, str(p))
        for p in root.glob("__bucket=*/part-*.parquet")
    ]
    # also support unpartitioned layouts (legacy flat topics)
    out += [(p.name, str(p)) for p in root.glob("part-*.parquet")]
    out.sort()
    return out


class ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class TopicShardStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options):
        self._dir = options["path"]
        self._starting = options.get("startingOffsets", "earliest").lower()
        self._schema = schema
        self._max_seen = ""  # monotonic guard: offsets never regress

    # -- offsets ----------------------------------------------------------

    def initialOffset(self) -> dict:
        # NOTE: must not read self._max_seen — the engine may call
        # latestOffset() before initialOffset() on the same instance.
        if self._starting == "latest":
            shards = _list_shards(self._dir)
            return {"watermark": shards[-1][0] if shards else ""}
        return {"watermark": ""}

    def latestOffset(self) -> dict:
        shards = _list_shards(self._dir)
        if shards and shards[-1][0] > self._max_seen:
            self._max_seen = shards[-1][0]
        return {"watermark": self._max_seen}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["watermark"], end["watermark"]
        return [
            ShardPartition(path)
            for name, path in _list_shards(self._dir)
            if lo < name <= hi
        ] or [ShardPartition("")]  # Spark requires >=1 partition

    # -- data -------------------------------------------------------------

    def read(self, partition: ShardPartition):
        if not partition.path:
            return
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self._schema)
        tbl = pq.read_table(partition.path)
        tbl = tbl.select([f.name for f in target])
        tbl = tbl.cast(target, safe=False)
        yield from tbl.to_batches()

    def commit(self, end: dict) -> None:
        pass  # shards are immutable; nothing to acknowledge


class TopicStreamDataSource(DataSource):
    """``spark.readStream.format("ella_topic")`` — register with
    ``spark.dataSource.register(TopicStreamDataSource)`` (done by
    ``Topic.read_stream_exact``)."""

    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self):
        # The Topic helper always passes an explicit schema; this is a
        # fallback error with a pointer rather than a footer-sniffing
        # guess (executors may not share the driver's filesystem view).
        raise ValueError(
            "ella_topic requires an explicit schema: use "
            "Topic.read_stream_exact(spark) or .schema(topic.spark_schema())"
        )

    def streamReader(self, schema) -> TopicShardStreamReader:
        return TopicShardStreamReader(schema, self.options)
