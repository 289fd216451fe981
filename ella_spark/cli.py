"""CLI + interactive SQL REPL (ella-cli parity,
ella-cli/src/main.rs:24-45, interactive.rs:20-36).

    python -m ella_spark open /path/to/db        # open + REPL
    python -m ella_spark create /path/to/db      # create + REPL
    python -m ella_spark sql /path/to/db "SELECT ..."  # one-shot

REPL commands: ``\\q`` quit, ``\\h`` help, ``\\d`` list tables,
anything else is SQL (passthrough like the reference REPL).
"""

from __future__ import annotations

import argparse
import sys


def _repl(db) -> None:
    print(f"ella_spark {__import__('ella_spark').__version__} — \\h for help")
    while True:
        try:
            line = input("ella> ").strip()
        except (EOFError, KeyboardInterrupt):
            print()
            break
        if not line:
            continue
        if line in ("\\q", "quit", "exit"):
            break
        if line == "\\h":
            print("\\q quit | \\h help | \\d list tables | <sql> run query")
            continue
        if line == "\\d":
            for t in db.tables():
                print(" ", t)
            continue
        try:
            print(db.query(line).execute().to_string(index=False))
        except Exception as e:  # noqa: BLE001 — REPL surfaces all errors
            print(f"error: {e}", file=sys.stderr)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ella_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    for cmd in ("open", "create"):
        sp = sub.add_parser(cmd, help=f"{cmd} a datastore and start the REPL")
        sp.add_argument("root")
    sq = sub.add_parser("sql", help="run one SQL statement and exit")
    sq.add_argument("root")
    sq.add_argument("query")
    sm = sub.add_parser(
        "maintain",
        help="one maintenance pass: compact, expire, manifest, "
        "refresh materialized views, clean orphans",
    )
    sm.add_argument("root")
    sm.add_argument(
        "--retention-days",
        type=float,
        default=None,
        help="drop day buckets older than this many days",
    )
    sm.add_argument(
        "--cluster-by",
        action="append",
        default=[],
        metavar="TOPIC=COL[,COL...]",
        help="value-sort compacted shards of TOPIC on the listed "
        "columns (repeatable; enables col_ranges file skipping)",
    )
    sm.add_argument(
        "--zorder",
        action="store_true",
        help="Morton-interleave the --cluster-by columns (2-4 cols)",
    )
    sm.add_argument(
        "--bloom",
        action="append",
        default=[],
        metavar="TOPIC=COL[,COL...]",
        help="build per-shard Bloom filters for point-lookup skipping "
        "on the listed columns (repeatable; see point_lookup())",
    )
    args = p.parse_args(argv)

    from ella_spark import Ella

    if args.cmd == "create":
        db = Ella.create(args.root)
    else:
        db = Ella.open(args.root)
    try:
        if args.cmd == "sql":
            print(db.query(args.query).execute().to_string(index=False))
        elif args.cmd == "maintain":
            import json as _json

            from ella_spark.maintenance import Maintainer

            retention = (
                int(args.retention_days * 86_400 * 1_000_000_000)
                if args.retention_days is not None
                else None
            )

            def _topic_cols(specs: list[str]) -> dict[str, list[str]]:
                out: dict[str, list[str]] = {}
                for spec in specs:
                    topic, _, cols = spec.partition("=")
                    if not cols:
                        raise SystemExit(
                            f"expected TOPIC=COL[,COL...], got {spec!r}"
                        )
                    out[topic] = [c for c in cols.split(",") if c]
                return out

            out = Maintainer(
                db,
                retention_ns=retention,
                cluster_by=_topic_cols(args.cluster_by),
                zorder=args.zorder,
                bloom_cols=_topic_cols(args.bloom),
            ).run_once()
            print(_json.dumps(out))
        else:
            _repl(db)
    finally:
        db.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
