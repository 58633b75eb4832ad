#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <name>/ parquet dump produced by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (with views over the sf parquet
tables), and compares results as multisets after sorting columns by name.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(v)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_rows, got_cols = got.fetchall(), [d[0] for d in got.description]
            exp = con.sql(sql)
            exp_rows, exp_cols = exp.fetchall(), [d[0] for d in exp.description]
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_bad += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(exp_cols)}")
            n_bad += 1
            continue
        # The driver's hasher sees DuckDB types the fetchall() path hides:
        # a HUGEINT output column (e.g. an uncast window SUM) hash-mismatches
        # a Spark BIGINT even when the values are numerically equal.
        huge = [c for c, t in zip(exp.columns, exp.types)
                if "HUGEINT" in str(t).upper()]
        if huge:
            print(f"FAIL {name}: oracle outputs HUGEINT cols {huge} "
                  f"(CAST ... AS BIGINT in the oracle SQL)")
            n_bad += 1
            continue
        g, e = canon(got_rows, got_cols), canon(exp_rows, exp_cols)
        if g == e:
            print(f"ok   {name}: {len(g)} rows")
            n_ok += 1
        else:
            n_bad += 1
            diff_g = [r for r in g if r not in set(e)][:3]
            diff_e = [r for r in e if r not in set(g)][:3]
            print(f"FAIL {name}: {len(g)} vs {len(e)} rows; "
                  f"spark-only={diff_g} oracle-only={diff_e}")
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
