#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB oracle compare.

Usage: python3 tools/check_parity.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same testdata
parquet, sorts columns by name, and compares values cell-by-cell.
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    out = {}
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            out[c] = col.astype("float64")
        elif pd.api.types.is_integer_dtype(col):
            out[c] = col.astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(col):
            out[c] = pd.to_datetime(col).astype("datetime64[us]").astype(str)
        else:
            # dates/objects/strings — stringify
            out[c] = col.map(lambda v: str(v))
    return pd.DataFrame(out)


def compare(name, spark_df, duck_df):
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return [f"columns differ: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"]
    if len(spark_df) != len(duck_df):
        problems.append(f"row count differs: spark={len(spark_df)} duck={len(duck_df)}")
        return problems
    s, o = canon(spark_df), canon(duck_df)
    for c in s.columns:
        sc, oc = s[c], o[c]
        if pd.api.types.is_float_dtype(sc) and pd.api.types.is_float_dtype(oc):
            eq = (sc.values == oc.values) | (pd.isna(sc.values) & pd.isna(oc.values))
            if not eq.all():
                idx = np.where(~eq)[0][:3]
                diffs = [(int(i), sc.iloc[i], oc.iloc[i]) for i in idx]
                maxd = np.nanmax(np.abs(sc.values - oc.values))
                problems.append(f"col {c}: {len(idx)}+ float mismatches, max|d|={maxd:.3e}, e.g. {diffs}")
        else:
            eq = (sc.astype(str).values == oc.astype(str).values)
            if not eq.all():
                idx = np.where(~eq)[0][:3]
                diffs = [(int(i), sc.iloc[i], oc.iloc[i]) for i in idx]
                problems.append(f"col {c}: {(~eq).sum()} mismatches, e.g. {diffs}")
    return problems


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = 0
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output written")
            continue
        try:
            spark_df = pd.read_parquet(f"{outdir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            continue
        problems = compare(name, spark_df, duck_df)
        if problems:
            print(f"FAIL {name} ({len(spark_df)} rows):")
            for p in problems:
                print(f"   {p}")
        else:
            print(f"OK   {name} ({len(spark_df)} rows, {len(spark_df.columns)} cols)")
            n_ok += 1
    print(f"== {n_ok}/{len(oracle)} queries match ==")


if __name__ == "__main__":
    main()
