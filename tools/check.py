#!/usr/bin/env python3
"""Dev-loop correctness check (emulates the driver's DuckDB-oracle gate).

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet dump written by graft.Verify plus
oracle_sql.json, runs each oracle in DuckDB against the sf_dir parquet
tables, and compares: column names (sorted), dtypes (loose), and values
(sorted rows, float-tolerant). Dev tooling only — NOT part of the
engine; the engine itself is pure Scala/Spark.
"""
import json
import os
import sys
import glob
import math

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    import datetime
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].map(lambda v: isinstance(v, datetime.date)).any():
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


STRICT = os.environ.get("GRAFT_CHECK_TOLERANT", "") == ""


def values_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        if STRICT:
            # engine output is engineered to be BIT-identical to the
            # oracle (same types, same double bits) — hold that line
            return (isinstance(a, float) and isinstance(b, float) and
                    (a == b or (math.isnan(a) and math.isnan(b))))
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b or (pd.isna(a) and pd.isna(b))


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in files]))
            want = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                if not values_equal(got[c].iloc[i], want[c].iloc[i]):
                    bad = (i, c, got[c].iloc[i], want[c].iloc[i])
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duckdb={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows, {len(got.columns)} cols)")
    print(f"{len(oracles) - n_fail}/{len(oracles)} passed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
