#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate: run each oracle SQL
in DuckDB against the testdata parquet and compare against the parquet
dumped by graft.Verify. Usage:
    python3 dev/check.py <sfDir> <verifyOutDir> [query ...]
Run graft.Verify first (sbt "runMain graft.Verify <sfDir> <outDir>").
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    # driver sorts columns by name before hashing values
    df = df[sorted(df.columns)]
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # date objects from duckdb vs timestamps etc
            try:
                if df[c].map(lambda x: hasattr(x, "isoformat"), na_action="ignore").all():
                    df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            except Exception:
                pass
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64") if df[c].isna().any() else df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        if only and name not in only:
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"EMPTY-OUT {name}")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracle:
            print(f"ROWS-ONLY {name}: rows={len(spark_df)} " +
                  ("OK" if len(spark_df) > 0 else "FAIL(empty)"))
            n_skip += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        bad = []
        for c in a.columns:
            av, bv = a[c], b[c]
            # the driver's hash is dtype-sensitive: a DuckDB HUGEINT that
            # pandas materializes as float64 vs Spark's int64 hash-mismatches
            # even when every value is equal — flag it instead of coercing
            if (pd.api.types.is_integer_dtype(av) != pd.api.types.is_integer_dtype(bv)
                    and not (av.isna().any() or bv.isna().any())):
                bad.append(f"{c}: DTYPE spark={av.dtype} duck={bv.dtype} "
                           "(CAST the oracle aggregate, e.g. AS BIGINT)")
                continue
            if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                eq = ((av.astype(float) == bv.astype(float)) |
                      (av.isna() & bv.isna()))
            else:
                eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = int(np.argmax(~eq.values))
                bad.append(f"{c}@row{i}: spark={av.iloc[i]!r} duck={bv.iloc[i]!r}")
        if bad:
            print(f"FAIL {name}: {len(bad)} cols differ: " + "; ".join(bad[:3]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows, {len(a.columns)} cols)")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
