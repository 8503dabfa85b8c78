#!/usr/bin/env python3
"""Driver-format correctness artifact: scripts/check.py's compare, emitted
as the CORRECTNESS_r{N}.json structure (per-query rows/schema/hash/err).

Usage: python3 scripts/check_json.py <sfDir> <verifyOutDir> <out.json>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sfdir, outdir, outjson):
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sfdir}/{name}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    result = {}
    for name in sorted(oracle):
        entry = {"rows_match": False, "schema_match": False,
                 "hash_match": False, "spark_rows": None,
                 "oracle_rows": None, "err": None}
        result[name] = entry
        try:
            exp = con.execute(oracle[name]).fetchdf()
            got = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            entry["err"] = str(e)[:300]
            continue
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        entry["spark_rows"] = len(got)
        entry["oracle_rows"] = len(exp)
        entry["rows_match"] = len(exp) == len(got)
        entry["schema_match"] = list(exp.columns) == list(got.columns)
        if not (entry["rows_match"] and entry["schema_match"]):
            continue
        ok = True
        for c in exp.columns:
            ev, gv = exp[c].tolist(), got[c].tolist()
            for a, b in zip(ev, gv):
                if a != b and not (a != a and b != b):
                    ok = False
                    break
            if not ok:
                break
        entry["hash_match"] = ok
    with open(outjson, "w") as f:
        json.dump(result, f, indent=2)
    n_ok = sum(1 for e in result.values()
               if e["rows_match"] and e["schema_match"] and e["hash_match"])
    print(f"{n_ok}/{len(result)} fully green -> {outjson}")
    return 0 if n_ok == len(result) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
