"""Lazy: deferred query handle (ella-engine/src/lazy.rs parity).

Spark DataFrames are already lazy, so this is a thin wrapper that
carries the engine reference and adds the reference's API verbs:
execute / stream / rows / limit / skip / col / create_view
(lazy.rs:34-97).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, Row

if TYPE_CHECKING:
    from ella_spark.engine import Ella


class Lazy:
    def __init__(self, df: DataFrame, engine: "Ella | None" = None, sql: str | None = None):
        self.df = df
        self._engine = engine
        self._sql = sql

    # -- execution (lazy.rs:34-44) ------------------------------------------

    def execute(self):
        """Run and concat to a single pandas frame (the reference's
        DataFrame result, lazy/backend.rs:35-41)."""
        return self.df.toPandas()

    def stream(self) -> Iterator[Row]:
        """Incremental row stream (Lazy::stream parity) — pulls
        partitions lazily instead of collecting."""
        return self.df.toLocalIterator()

    def rows(self, row_type: type | None = None) -> Iterator:
        """Typed row iterator (Lazy::rows / RowStream parity).

        With ``row_type`` — a dataclass (or any class constructible by
        field name) — each row maps to an instance by column name: the
        Python analog of ``#[derive(RowFormat)]`` + ``Lazy::rows::<R>()``
        (ella-derive/src/lib.rs:7-23). Missing columns raise; extra
        result columns are ignored so SELECT * works against a narrower
        row type.
        """
        if row_type is None:
            for r in self.df.toLocalIterator():
                yield tuple(r)
            return
        import dataclasses

        if dataclasses.is_dataclass(row_type):
            names = [f.name for f in dataclasses.fields(row_type)]
        else:
            names = list(getattr(row_type, "_fields", ()))  # NamedTuple
            if not names:
                raise TypeError(
                    f"{row_type.__name__} must be a dataclass or NamedTuple"
                )
        missing = [n for n in names if n not in self.df.columns]
        if missing:
            raise ValueError(
                f"result lacks columns {missing} required by {row_type.__name__}"
            )
        for r in self.df.select(names).toLocalIterator():
            yield row_type(**r.asDict())

    # -- plan rewrites (lazy.rs:46-97) ----------------------------------------

    def limit(self, n: int) -> "Lazy":
        return Lazy(self.df.limit(n), self._engine, self._sql)

    def skip(self, n: int) -> "Lazy":
        return Lazy(self.df.offset(n), self._engine, self._sql)

    def col(self, name: str):
        """Single-column projection → numpy array (Lazy::col → Tensor,
        lazy.rs:62-97)."""
        import numpy as np

        pdf = self.df.select(name).toPandas()
        vals = pdf[name].to_list()
        if vals and isinstance(vals[0], (list, tuple, np.ndarray)):
            return np.stack([np.asarray(v) for v in vals])
        return np.asarray(vals)

    def create_view(self, name: str, materialize: bool = False) -> "Lazy":
        """Register this plan as a named view (lazy/view.rs:10-76).

        ``materialize=True`` creates a materialized view — declared but
        `todo!()`d in the reference (view.rs:36-39); here it works:
        versioned parquet snapshot, refreshed via
        ``Ella.refresh_materialized``.
        """
        if self._engine is None:
            raise RuntimeError("Lazy is not attached to an engine")
        if materialize:
            self._engine.create_materialized_view(name, self)
        else:
            self._engine.create_view(name, self)
        return self

    def explain(self, mode: str = "formatted") -> None:
        self.df.explain(mode)
