#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/selfcheck.py <sfdir> <verify_outdir>

Reads each <verify_outdir>/<name> parquet (Spark result), runs the
matching SQL from oracle_sql.json in DuckDB over views named after the
testdata tables, and compares: row count, column names (sorted), and
values (columns sorted by name, rows sorted by all columns, exact match
+ tolerance diagnostics for floats).
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare: decimals/uint -> float/int, dates -> str
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.reset_index(drop=True)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.loads(Path(f"{outdir}/oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{outdir}/{name}")
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: load error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        if not problems:
            g, w = canon(got), canon(want)
            g = g.sort_values(by=list(g.columns), kind="mergesort").reset_index(drop=True)
            w = w.sort_values(by=list(w.columns), kind="mergesort").reset_index(drop=True)
            for c in g.columns:
                gv, wv = g[c], w[c]
                if str(gv.dtype) != str(wv.dtype):
                    problems.append(f"dtype[{c}] {gv.dtype} != {wv.dtype}")
                try:
                    if gv.dtype.kind == "f" or wv.dtype.kind == "f":
                        eq = ((gv == wv) | (gv.isna() & wv.isna()))
                        if not eq.all():
                            i = (~eq).idxmax()
                            d = abs(float(gv[i]) - float(wv[i])) if not (
                                math.isnan(float(gv[i])) and math.isnan(float(wv[i]))) else 0
                            problems.append(f"val[{c}] row{i}: {gv[i]!r} != {wv[i]!r} (absdiff {d:g})")
                    else:
                        eq = (gv.astype(str) == wv.astype(str))
                        if not eq.all():
                            i = (~eq).idxmax()
                            problems.append(f"val[{c}] row{i}: {gv[i]!r} != {wv[i]!r}")
                except Exception as e:
                    problems.append(f"cmp[{c}] error: {e}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
