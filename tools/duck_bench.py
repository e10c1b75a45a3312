#!/usr/bin/env python3
"""Same-window DuckDB side of the bench protocol: time every oracle SQL
from a Verify dump's oracle_sql.json against the given SF dir, one pass,
materializing each result (same shape as graft.Bench's one pass per
query). Usage:

    python3 tools/duck_bench.py <sfDir> <verifyOutWithOracleJson>

Prints one JSON line: {"total": secs, "queries": {name: secs, ...}}.
Run in the SAME quiet window as graft.Bench (see NOTES bench protocol;
never concurrently with sbt)."""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out}/oracle_sql.json") as f:
        oracles = json.load(f)
    times = {}
    for name, sql in sorted(oracles.items()):
        t0 = time.monotonic()
        con.sql(sql).df()
        times[name] = round(time.monotonic() - t0, 3)
    print(json.dumps({"total": round(sum(times.values()), 1),
                      "sf": sf_dir, "queries": times}))


if __name__ == "__main__":
    main()
