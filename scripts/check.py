#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against DuckDB executing oracle_sql.json on the same parquet fixtures,
compare row counts, schemas (column names), and value hashes.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
(Driver-side tooling only — the Scala library never depends on this.)
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            df[c] = col.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(col):
            df[c] = col.round(9)
        elif pd.api.types.is_integer_dtype(col):
            df[c] = col.astype("int64")
        elif col.dtype == object:
            try:
                df[c] = col.astype("int64")
            except (ValueError, TypeError):
                df[c] = col.astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = pq.read_table(res_dir).to_pandas()
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        s, dd = normalize(spark_df), normalize(duck_df)
        rows_ok = len(s) == len(dd)
        cols_ok = list(s.columns) == list(dd.columns)
        hash_ok = rows_ok and cols_ok and s.equals(dd)
        if hash_ok:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows {len(s)}/{len(dd)} cols_ok={cols_ok}")
            if cols_ok and rows_ok:
                neq = (s != dd).any(axis=0)
                bad_cols = list(neq[neq].index)
                print(f"  mismatching cols: {bad_cols}")
                mask = (s != dd).any(axis=1)
                print("  spark:", s[mask].head(3).to_dict("records"))
                print("  duck :", dd[mask].head(3).to_dict("records"))
            else:
                print("  spark cols:", list(s.columns))
                print("  duck  cols:", list(dd.columns))
    # rows-only queries (no oracle): check rows > 0
    for res_dir in sorted(glob.glob(os.path.join(out_dir, "q*"))):
        name = os.path.basename(res_dir)
        if name in oracle or not os.path.isdir(res_dir):
            continue
        try:
            n = pq.read_table(res_dir).num_rows
            status = "PASS" if n > 0 else "FAIL(empty)"
            print(f"{status} {name} rows-only ({n} rows)")
            if n > 0: n_pass += 1
            else: n_fail += 1
        except Exception as e:
            print(f"FAIL {name} rows-only: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
