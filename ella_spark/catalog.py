"""Catalog tree + durability: Catalog → Schema → Table with a JSON
transaction log and snapshots.

Reference semantics (SURVEY.md §0.4, §3.3 step 6):
- tree with defaults ``ella``/``public`` (ella-engine/src/config.rs:16-25)
- every DDL/shard event appends one JSON transaction to the log
  (ella-engine/src/registry/transaction_log.rs:41-70)
- snapshot consolidation on shutdown; replay on open
  (registry/snapshot.rs:28-66)

Layout under a root directory:
    <root>/.ella/log/<seq>.json      transaction log entries
    <root>/.ella/snapshot.json       squashed catalog state
    <root>/<catalog>/<schema>/<table>/*.parquet   data shards

The log stores only catalog state (like the reference — data itself is
not WAL'd; Parquet files are the durable data). At cluster scale the
same layout works on any object store via its rename/put primitives.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from pathlib import Path

from ella_spark.types import Column

DEFAULT_CATALOG = "ella"
DEFAULT_SCHEMA = "public"


@dataclass
class TableEntry:
    catalog: str
    schema: str
    name: str
    kind: str  # "topic" | "view" | "materialized_view"
    columns: list[Column] = field(default_factory=list)
    sql: str | None = None  # for views: stored plan as SQL text
    temporary: bool = False
    indexes: list[tuple[str, bool]] = field(default_factory=list)
    #: materialized views: current snapshot version (0 = never refreshed)
    version: int = 0
    #: materialized views: Spark schema JSON of the snapshot (needed to
    #: read an empty snapshot and to skip footer merging)
    result_schema: str | None = None
    #: materialized views over a single topic: incremental-refresh
    #: cursor — the exact shard basenames folded into the current
    #: snapshot (``{"topic": <view name>, "shards": [...], "rows": n}``).
    #: None → the stored SQL isn't delta-refreshable (or never analyzed);
    #: refresh falls back to full recompute.
    refresh_state: dict | None = None
    #: materialized views: how many snapshot versions to retain
    #: (time travel via `FOR VERSION AS OF` / Ella.read_mv_version);
    #: 1 = current only (old versions pruned at commit, the default)
    keep_versions: int = 1
    #: materialized views: [version, commit_epoch_ns] per retained
    #: snapshot (maps `FOR TIMESTAMP AS OF` onto a version)
    version_log: list = field(default_factory=list)

    @property
    def ident(self) -> tuple[str, str, str]:
        return (self.catalog, self.schema, self.name)

    def to_json(self) -> dict:
        return {
            "catalog": self.catalog,
            "schema": self.schema,
            "name": self.name,
            "kind": self.kind,
            "columns": [c.to_json() for c in self.columns],
            "sql": self.sql,
            "temporary": self.temporary,
            "indexes": [list(i) for i in self.indexes],
            "version": self.version,
            "result_schema": self.result_schema,
            "refresh_state": self.refresh_state,
            "keep_versions": self.keep_versions,
            "version_log": [list(v) for v in self.version_log],
        }

    @classmethod
    def from_json(cls, d: dict) -> "TableEntry":
        return cls(
            catalog=d["catalog"],
            schema=d["schema"],
            name=d["name"],
            kind=d["kind"],
            columns=[Column.from_json(c) for c in d.get("columns", [])],
            sql=d.get("sql"),
            temporary=d.get("temporary", False),
            indexes=[tuple(i) for i in d.get("indexes", [])],
            version=d.get("version", 0),
            result_schema=d.get("result_schema"),
            refresh_state=d.get("refresh_state"),
            keep_versions=d.get("keep_versions", 1),
            version_log=[tuple(v) for v in d.get("version_log", [])],
        )


class CatalogStore:
    """Durable catalog: in-memory tree + append-only JSON log.

    Mirrors EllaCluster→EllaCatalog→EllaSchema resolution
    (cluster.rs:132, catalog.rs:165, schema.rs:168) with the
    transaction-log/snapshot durability of registry/transaction_log.rs.
    """

    def __init__(self, root: str | os.PathLike):
        self.root = Path(root)
        self.meta_dir = self.root / ".ella"
        self.log_dir = self.meta_dir / "log"
        self.catalogs: set[str] = set()
        self.schemas: set[tuple[str, str]] = set()
        self.tables: dict[tuple[str, str, str], TableEntry] = {}
        self._seq = 0

    # -- lifecycle ---------------------------------------------------------

    @classmethod
    def create(cls, root: str | os.PathLike) -> "CatalogStore":
        store = cls(root)
        store.log_dir.mkdir(parents=True, exist_ok=True)
        store._apply_and_log({"op": "create_catalog", "name": DEFAULT_CATALOG})
        store._apply_and_log(
            {"op": "create_schema", "catalog": DEFAULT_CATALOG, "name": DEFAULT_SCHEMA}
        )
        return store

    @classmethod
    def open(cls, root: str | os.PathLike) -> "CatalogStore":
        store = cls(root)
        if not store.meta_dir.exists():
            raise FileNotFoundError(f"no ella datastore at {root} (missing .ella/)")
        snap = store.meta_dir / "snapshot.json"
        if snap.exists():
            state = json.loads(snap.read_text())
            store.catalogs = set(state["catalogs"])
            store.schemas = {tuple(s) for s in state["schemas"]}
            store.tables = {
                tuple(k.split("\x00")): TableEntry.from_json(v)
                for k, v in state["tables"].items()
            }
            store._seq = state["seq"]
        # replay any log entries after the snapshot (snapshot.rs:28-66)
        for f in sorted(store.log_dir.glob("*.json")):
            seq = int(f.stem.split("-")[0])
            if seq > store._seq:
                store._apply(json.loads(f.read_text()))
                store._seq = seq
        return store

    def snapshot(self) -> None:
        """Squash log into snapshot.json (Engine::shutdown parity,
        ella-engine/src/engine.rs:36-39)."""
        state = {
            "seq": self._seq,
            "catalogs": sorted(self.catalogs),
            "schemas": sorted(list(s) for s in self.schemas),
            "tables": {
                "\x00".join(k): v.to_json() for k, v in self.tables.items()
            },
        }
        tmp = self.meta_dir / f".snapshot.{uuid.uuid4().hex}.tmp"
        tmp.write_text(json.dumps(state, indent=1))
        tmp.replace(self.meta_dir / "snapshot.json")
        for f in self.log_dir.glob("*.json"):
            if int(f.stem.split("-")[0]) <= self._seq:
                f.unlink()

    # -- log ----------------------------------------------------------------

    def _apply_and_log(self, txn: dict) -> None:
        self._apply(txn)
        self._seq += 1
        txn = {**txn, "ts": time.time_ns()}
        entry = self.log_dir / f"{self._seq:012d}-{uuid.uuid4().hex[:8]}.json"
        tmp = entry.with_suffix(".tmp")
        tmp.write_text(json.dumps(txn))
        tmp.replace(entry)

    def _apply(self, txn: dict) -> None:
        op = txn["op"]
        if op == "create_catalog":
            self.catalogs.add(txn["name"])
        elif op == "drop_catalog":
            self.catalogs.discard(txn["name"])
            self.schemas = {s for s in self.schemas if s[0] != txn["name"]}
            self.tables = {
                k: v for k, v in self.tables.items() if k[0] != txn["name"]
            }
        elif op == "create_schema":
            self.schemas.add((txn["catalog"], txn["name"]))
        elif op == "drop_schema":
            self.schemas.discard((txn["catalog"], txn["name"]))
            self.tables = {
                k: v
                for k, v in self.tables.items()
                if (k[0], k[1]) != (txn["catalog"], txn["name"])
            }
        elif op == "create_table":
            e = TableEntry.from_json(txn["table"])
            self.tables[e.ident] = e
        elif op == "drop_table":
            self.tables.pop(
                (txn["catalog"], txn["schema"], txn["name"]), None
            )
        else:
            raise ValueError(f"unknown txn op {op!r}")

    # -- DDL (state.rs:156-279 / lazy/backend.rs:66-161 parity) -------------

    def create_catalog(self, name: str, if_not_exists: bool = False) -> None:
        if name in self.catalogs:
            if if_not_exists:
                return
            raise ValueError(f"catalog {name!r} already exists")
        self._apply_and_log({"op": "create_catalog", "name": name})

    def create_schema(
        self, name: str, catalog: str = DEFAULT_CATALOG, if_not_exists: bool = False
    ) -> None:
        if catalog not in self.catalogs:
            raise ValueError(f"catalog {catalog!r} does not exist")
        if (catalog, name) in self.schemas:
            if if_not_exists:
                return
            raise ValueError(f"schema {catalog}.{name} already exists")
        self._apply_and_log({"op": "create_schema", "catalog": catalog, "name": name})

    def drop_schema(self, name: str, catalog: str = DEFAULT_CATALOG) -> None:
        if (catalog, name) not in self.schemas:
            raise ValueError(f"schema {catalog}.{name} does not exist")
        self._apply_and_log({"op": "drop_schema", "catalog": catalog, "name": name})

    def drop_catalog(self, name: str) -> None:
        if name not in self.catalogs:
            raise ValueError(f"catalog {name!r} does not exist")
        self._apply_and_log({"op": "drop_catalog", "name": name})

    def put_table(self, entry: TableEntry, replace: bool = False) -> None:
        if (entry.catalog, entry.schema) not in self.schemas:
            raise ValueError(f"schema {entry.catalog}.{entry.schema} does not exist")
        if entry.ident in self.tables and not replace:
            raise ValueError(f"table {'.'.join(entry.ident)} already exists")
        self._apply_and_log({"op": "create_table", "table": entry.to_json()})

    def drop_table(self, catalog: str, schema: str, name: str) -> None:
        if (catalog, schema, name) not in self.tables:
            raise ValueError(f"table {catalog}.{schema}.{name} does not exist")
        self._apply_and_log(
            {"op": "drop_table", "catalog": catalog, "schema": schema, "name": name}
        )

    # -- resolution ----------------------------------------------------------

    def resolve(
        self, name: str, catalog: str = DEFAULT_CATALOG, schema: str = DEFAULT_SCHEMA
    ) -> TableEntry | None:
        """Resolve 1-, 2-, or 3-part dotted name against defaults."""
        parts = name.split(".")
        if len(parts) == 1:
            key = (catalog, schema, parts[0])
        elif len(parts) == 2:
            key = (catalog, parts[0], parts[1])
        elif len(parts) == 3:
            key = tuple(parts)
        else:
            raise ValueError(f"invalid table name {name!r}")
        return self.tables.get(key)  # type: ignore[arg-type]

    def table_path(self, entry: TableEntry) -> Path:
        return self.root / entry.catalog / entry.schema / entry.name
