#!/usr/bin/env python3
"""Dev-only oracle check harness (mirrors the driver's t2 gate).

Runs each SparkEntry query result (parquet dumped by graft.Verify) against
its DuckDB oracle SQL over the same sf tables; compares row count, column
names (sorted), declared DuckDB column TYPES, and exact values. Not part
of the shipped library.

The type check exists because the driver's hash is type-sensitive: a bare
integer ``sum()`` in the oracle SQL comes back from DuckDB as HUGEINT
(int128) while the Spark parquet output is BIGINT, and the two hash
differently even when every value is identical (this shipped q14/q145/
q146/q147 red for four rounds while a stringify-and-round checker said
pass). Any declared-type divergence between the Spark result read back
through DuckDB and the oracle relation is therefore a FAIL here, as is
any exact-value difference; when only float rounding would reconcile the
values we say so, to separate ulp/type artifacts from wrong answers.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def exact(rows):
    """Canonical exact form: NaN made self-equal, -0.0 folded to 0.0,
    everything else compared by value AND python type (int vs float vs
    Decimal survive distinctly, mirroring a type-sensitive hash)."""
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append(("f", "nan"))
                else:
                    vals.append(("f", v + 0.0 if v != 0 else 0.0))
            else:
                vals.append((type(v).__name__, str(v)))
        out.append(tuple(vals))
    return sorted(out)


def lenient(rows):
    """The old stringify-and-round-6dp form, kept only to classify
    failures (exact-fail + lenient-pass = type/ulp artifact)."""
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
            got_sel = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in got_cols) +
                " FROM got_rel")
            exp_rel = con.sql(sql)
            exp_cols = sorted(exp_rel.columns)
            exp_sel = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in exp_cols) +
                " FROM exp_rel")
            got_types = [str(t) for t in got_sel.types]
            exp_types = [str(t) for t in exp_sel.types]
            got = got_sel.fetchall()
            exp = exp_sel.fetchall()
            if got_cols != exp_cols:
                print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
                n_fail += 1
            elif got_types != exp_types:
                diffs = [(c, g, e) for c, g, e in
                         zip(got_cols, got_types, exp_types) if g != e]
                print(f"FAIL {name}: TYPE mismatch (driver hash is "
                      f"type-sensitive): {diffs}")
                n_fail += 1
            elif len(got) != len(exp):
                print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
                n_fail += 1
            elif exact(got) != exact(exp):
                kind = ("float-rounding-only (ulp artifact?)"
                        if lenient(got) == lenient(exp)
                        else "REAL value mismatch")
                ng, ne = exact(got), exact(exp)
                diff = [(a, b) for a, b in zip(ng, ne) if a != b][:3]
                print(f"FAIL {name}: {kind}, first diffs: {diff}")
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
