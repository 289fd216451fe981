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
from ella_spark.engine import Ella, create, open, open_or_create  # noqa: A004
from ella_spark.lazy import Lazy
from ella_spark.maintenance import Maintainer, compact_topic
from ella_spark.session import configure, get_session
from ella_spark.topic import Publisher, Topic
from ella_spark.types import Column

__all__ = [
    "CatalogStore",
    "Column",
    "Ella",
    "Lazy",
    "Maintainer",
    "Publisher",
    "TableEntry",
    "Topic",
    "compact_topic",
    "configure",
    "create",
    "get_session",
    "open",
    "open_or_create",
]

__version__ = "0.1.0"
