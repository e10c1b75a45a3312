#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify at a given
SF, then replay each oracle_sql.json query in DuckDB over the same parquet
tables and compare values (columns sorted by name, rows sorted)."""
import json
import subprocess
import sys

import duckdb
import pandas as pd

# positional args = [SF_DIR, OUT]; flags (--only X, --no-verify) are
# filtered out first so a flag is never mistaken for a directory
_pos = [a for i, a in enumerate(sys.argv[1:], 1)
        if not a.startswith("--")
        and not (i >= 2 and sys.argv[i - 1] == "--only")]
SF_DIR = _pos[0] if len(_pos) > 0 else "/root/testdata/sf0.001"
OUT = _pos[1] if len(_pos) > 1 else "/tmp/graft_verify"
# --only q_a,q_b : verify + compare just those queries
ONLY = None
for i, a in enumerate(sys.argv):
    if a == "--only" and i + 1 < len(sys.argv):
        ONLY = set(sys.argv[i + 1].split(","))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_verify():
    cmd = f"runMain graft.Verify {SF_DIR} {OUT}"
    if ONLY:
        cmd += " " + ",".join(sorted(ONLY))
    r = subprocess.run(
        ["sbt", cmd],
        capture_output=True, text=True, cwd="/root/repo")
    if r.returncode != 0:
        print(r.stdout[-4000:])
        print(r.stderr[-4000:])
        sys.exit("verify failed")
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print(line)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    if "--no-verify" not in sys.argv:
        run_verify()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    with open(f"{OUT}/oracle_sql.json") as f:
        oracles = json.load(f)
    ok = fail = 0
    for name, sql in sorted(oracles.items()):
        if ONLY and name not in ONLY:
            continue
        try:
            spark_df = pd.read_parquet(f"{OUT}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            fail += 1
            continue
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            fail += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            fail += 1
            continue
        # Driver hashes VALUES: an int64 vs float64 column (e.g. DuckDB
        # sum(BIGINT)→HUGEINT→float64) hash-mismatches even when values are
        # equal, so dtype KIND must match too (int vs float vs object).
        kinds_a = [a[c].dtype.kind for c in a.columns]
        kinds_b = [b[c].dtype.kind for c in b.columns]
        if kinds_a != kinds_b:
            print(f"FAIL {name}: dtype kinds "
                  f"{dict(zip(a.columns, kinds_a))} vs "
                  f"{dict(zip(b.columns, kinds_b))}")
            fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=True)
            print(f"ok   {name} ({len(a)} rows)")
            ok += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:500]}")
            fail += 1
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
