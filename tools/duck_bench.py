#!/usr/bin/env python3
"""DuckDB baseline bench over the engine's own oracle SQL.

Runs every oracle from a graft.Verify dump (oracle_sql.json) against the
same parquet tables DuckDB-side, N passes (default 2), reports per-query
MIN and the total of mins — the auditable denominator for the "Spark
within 2x DuckDB at the same SF" claim in BASELINE.md.

Usage:
    python3 tools/duck_bench.py <sfDir> <oracle_sql.json> [runs] [threads]
    # e.g. after: sbt "runMain graft.Verify /root/testdata/sf0.1 /tmp/v"
    python3 tools/duck_bench.py /root/testdata/sf0.1 /tmp/v/oracle_sql.json

Prints one JSON line: {"metric":"duckdb_total","value":S,"unit":"sec",
"sf":dir,"threads":T,"runs":N,"queries":{name:min_sec,...}}.

Tooling-only: duckdb is available to the dev/driver environment, never to
the Scala build (zero-egress; see build.sbt).
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    threads = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracles = json.load(open(oracle_path))
    best = {}
    errors = {}
    for _ in range(runs):
        for name, sql in sorted(oracles.items()):
            t0 = time.time()
            try:
                con.execute(sql).fetchall()
            except Exception as e:  # surface, keep benching the rest
                errors[name] = str(e)[:120]
                continue
            dt = time.time() - t0
            best[name] = min(best.get(name, dt), dt)

    for name, err in errors.items():
        print(f"ERR {name}: {err}", file=sys.stderr)
    total = round(sum(best.values()), 2)
    print(json.dumps({"metric": "duckdb_total", "value": total,
                      "unit": "sec", "sf": sf_dir, "threads": threads,
                      "runs": runs,
                      "queries": {k: round(v, 3) for k, v in sorted(best.items())}}))
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
