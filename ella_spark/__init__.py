"""ella_spark: a PySpark-native streaming time-series analytics engine
with the query and data-processing capabilities of CerebusOSS/ella,
re-expressed Spark-first (see SURVEY.md for the full mapping).

Quick start (reference README parity):

    import ella_spark as ella
    from ella_spark import Column

    db = ella.open_or_create("/tmp/mydb")
    topic = db.create_topic("sensor", [Column("x", "float32")])
    with topic.publish() as pub:
        pub.write(0.5)          # time auto-filled with now() ns
        pub.write(1.5)
    df = db.query("SELECT time, x FROM sensor WHERE x > 0 ORDER BY time")
    print(df.execute())
"""

from ella_spark.catalog import CatalogStore, TableEntry
from ella_spark.engine import Ella, TableRef, create, open, open_or_create  # noqa: A004
from ella_spark.lazy import Lazy
from ella_spark.maintenance import Maintainer, compact_topic
from ella_spark.session import configure, get_session
from ella_spark.topic import Publisher, Topic

# pyella module-surface parity (pyella/src/lib.rs:45-49): column/topic
# schema declarators + high-precision now(). The `topic` FUNCTION
# shadows the `ella_spark.topic` submodule attribute by design —
# exactly like pyella, `ella.topic(...)` declares a schema; the
# submodule stays importable via `from ella_spark.topic import ...`.
from ella_spark.types import Column, TopicInfo, column, now, topic

__all__ = [
    "CatalogStore",
    "Column",
    "Ella",
    "Lazy",
    "Maintainer",
    "Publisher",
    "TableEntry",
    "TableRef",
    "Topic",
    "TopicInfo",
    "column",
    "compact_topic",
    "configure",
    "create",
    "get_session",
    "now",
    "open",
    "open_or_create",
    "topic",
]

__version__ = "0.1.0"
