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
