"""CLI smoke tests (ella-cli parity, main.rs:24-45)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from ella_spark import Column, Ella


def test_cli_sql_one_shot(spark, tmp_path, monkeypatch):
    """`python -m ella_spark sql <root> <query>` prints the result."""
    root = str(tmp_path / "clidb")
    db = Ella.create(root, spark)
    t = db.create_topic("c1", [Column("v", "int64")])
    with t.publish() as pub:
        pub.write(1_000, 7)
    db.shutdown()

    # reuse the active session (get_session returns the running one)
    from ella_spark import cli

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main(["sql", root, "SELECT v FROM c1"])
    assert rc == 0
    assert "7" in buf.getvalue()


def test_cli_repl_commands(spark, tmp_path, monkeypatch):
    root = str(tmp_path / "replb")
    db = Ella.create(root, spark)
    db.create_topic("r1", [Column("v", "int64")])
    db.shutdown()

    from ella_spark import cli

    inputs = iter(["\\h", "\\d", "SELECT 1 AS one", "\\q"])
    monkeypatch.setattr("builtins.input", lambda _: next(inputs))
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main(["open", root])
    assert rc == 0
    out = buf.getvalue()
    assert "help" in out and "r1" in out and "1" in out


def test_cli_maintain_flags(spark, tmp_path, monkeypatch, capsys):
    """maintain --bloom/--cluster-by TOPIC=COLS plumb into the
    Maintainer: the manifest gains per-shard Bloom filters."""
    import json

    from ella_spark import Ella
    from ella_spark.cli import main
    from ella_spark.topic import Topic
    from ella_spark.types import Column

    root = str(tmp_path / "clidb")
    db = Ella.create(root, spark)
    t = db.create_topic("cm", [Column("k", "int64")])
    t.insert(spark.range(20).coalesce(1).selectExpr("id*1000 AS time", "id AS k"))
    db.shutdown()

    assert main(["maintain", root, "--bloom", "cm=k"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "errors" in out
    db2 = Ella.open(root, spark)
    try:
        m = Topic(db2.store, db2.store.resolve("cm")).manifest()
        assert m and all("k" in e.get("b", {}) for e in m.values())
    finally:
        db2.shutdown()

    # malformed spec errors out clearly
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["maintain", root, "--bloom", "cm"])
