"""Query registry: the judgeable operator inventory (SURVEY.md §2).

Each entry pairs a Spark-first DataFrame implementation with an
ANSI-SQL oracle that DuckDB runs over the same parquet tables. Column
names are aliased identically on both sides (the driver hash-compares
by sorted column name).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return {name: spec.spark for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }


_LOADED = False


def _load() -> None:
    """Import query modules (each registers into REGISTRY on import)."""
    global _LOADED
    if _LOADED:
        return
    # Registration order matters: the correctness driver walks queries in
    # registration order under a run budget (CORRECTNESS_r01 covered exactly
    # the first 50 registered queries). The beyond-reference LLM-pipeline
    # operators (dedup / ANN / text) register FIRST so they are always
    # within the checked prefix.
    from ella_spark.queries import (  # noqa: F401
        dedup,
        similarity,
        textops,
        relational,
        window,
        timeseries,
        arrays,
    )

    _LOADED = True
