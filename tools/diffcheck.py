#!/usr/bin/env python3
"""Local differential check mimicking the driver's DuckDB oracle gate.

Usage: python3 tools/diffcheck.py <sfDir> <outDir>
Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
Compares each <outDir>/<name> parquet against oracle_sql.json run on
DuckDB views of the base tables, sorted-row exact equality.
"""
import duckdb
import glob
import json
import os
import sys

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output")
            failures += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            want = con.sql(sql).fetchdf()
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            failures += 1
            continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"SCHEMA   {name}: spark={list(got.columns)} duck={list(want.columns)}")
            failures += 1
            continue
        g = got[gc].sort_values(gc).reset_index(drop=True)
        w = want[wc].sort_values(wc).reset_index(drop=True)
        if len(g) != len(w):
            print(f"ROWS     {name}: spark={len(g)} duck={len(w)}")
            failures += 1
            continue
        # exact value compare, column by column
        bad = None
        for c in gc:
            gv, wv = g[c], w[c]
            try:
                eq = (gv.astype(str) == wv.astype(str))
            except Exception:
                eq = gv == wv
            if not eq.all():
                i = (~eq).idxmax()
                bad = (c, i, gv[i], wv[i])
                break
        if bad:
            c, i, a, b = bad
            print(f"VALUE    {name}: col={c} row={i} spark={a!r} duck={b!r}")
            failures += 1
        else:
            print(f"OK       {name} ({len(g)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
