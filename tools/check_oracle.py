#!/usr/bin/env python3
"""Dev-only oracle check harness (mirrors the driver's t2 gate).

Runs each SparkEntry query result (parquet dumped by graft.Verify) against
its DuckDB oracle SQL over the same sf tables; compares row count, column
names (sorted), and values. Not part of the shipped library.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(round(v, 6))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = sorted(got_rel.columns)
            got = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in got_cols) +
                " FROM got_rel").fetchall()
            exp_rel = con.sql(sql)
            exp_cols = sorted(exp_rel.columns)
            exp = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in exp_cols) +
                " FROM exp_rel").fetchall()
            if got_cols != exp_cols:
                print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
                n_fail += 1
            elif len(got) != len(exp):
                print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
                n_fail += 1
            elif norm(got) != norm(exp):
                ng, ne = norm(got), norm(exp)
                diff = [(a, b) for a, b in zip(ng, ne) if a != b][:3]
                print(f"FAIL {name}: value mismatch, first diffs: {diff}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {str(e)[:200]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
