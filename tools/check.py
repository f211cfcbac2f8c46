#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: read graft.Verify's
parquet dumps, run each oracle SQL in DuckDB over the same testdata tables,
and compare (columns sorted by name, rows compared in full).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: error {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1
            continue
        if got.dtypes.tolist() != want.dtypes.tolist():
            print(f"WARN {name}: dtypes {got.dtypes.tolist()} vs {want.dtypes.tolist()}")
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        eq = got.reset_index(drop=True).astype(str).equals(
            want.reset_index(drop=True).astype(str))
        if eq:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            diff = (got.reset_index(drop=True).astype(str)
                    != want.reset_index(drop=True).astype(str))
            bad = diff.any(axis=1)
            idx = bad[bad].index[:3]
            print(f"FAIL {name}: {int(bad.sum())}/{len(got)} rows differ; first diffs:")
            for i in idx:
                cols = diff.columns[diff.loc[i]].tolist()
                print(f"  row {i} cols {cols}")
                print(f"    got : {got.loc[i, cols].tolist()}")
                print(f"    want: {want.loc[i, cols].tolist()}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len([q for q in oracle if not only or q in only])} oracles checked")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
