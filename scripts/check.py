#!/usr/bin/env python3
"""Dev-loop mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each Spark result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same source tables, and
compares (schema, row count, values with columns sorted by name).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    return df


def main(sfdir, outdir):
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sfdir}/{name}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.execute(sql).fetchdf()
            got = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        exp, got = norm(exp), norm(got)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
            continue
        dt_exp = [str(t) for t in exp.dtypes]
        dt_got = [str(t) for t in got.dtypes]
        mism = []
        for c in exp.columns:
            ev, gv = exp[c].tolist(), got[c].tolist()
            bad = [i for i, (a, b) in enumerate(zip(ev, gv))
                   if a != b and not (a != a and b != b)]
            if bad:
                i = bad[0]
                mism.append(f"{c}[{i}]: exp={ev[i]!r} got={gv[i]!r} (+{len(bad)-1} more)")
        if mism:
            print(f"FAIL {name}: {'; '.join(mism[:3])}")
            n_fail += 1
        else:
            note = "" if dt_exp == dt_got else f"  [dtype diff exp={dt_exp} got={dt_got}]"
            print(f"PASS {name} ({len(exp)} rows){note}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
