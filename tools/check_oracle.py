#!/usr/bin/env python3
"""Dev-only pre-check of the driver's t2 oracle comparison.

Replicates what the driver does with Verify.scala output: reads each
query's parquet result, runs the matching oracle SQL in DuckDB over the
same testdata parquet, and compares (columns sorted by name, values
compared in row order, exact for non-floats, tiny-tolerance report for
floats so near-misses are visible).

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
(run `sbt "runMain graft.Verify <sf_dir> <verify_out_dir>"` first)

This script is a development tool only — the shipped library is pure
Scala/Spark and does not depend on it.
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_spark_result(path):
    import glob
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        return None
    return pq.read_table(files[0] if len(files) == 1 else path).to_pandas()


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def cmp_values(a, b):
    """Return (n_mismatch, first_diff_desc, n_float_close)."""
    n_bad, n_close, first = 0, 0, None
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        # Materialization artifact, not a divergence: a NULL in a
        # non-float column (BOOLEAN, VARCHAR) comes back as None from
        # pyarrow (Spark side) but as float NaN from DuckDB's fetchdf
        # (which uses NaN as its null sentinel in object columns too).
        # None ≡ NaN is accepted ONLY when at least one side materialized
        # the column as object/bool — two genuine float64 columns where
        # one engine nulled and the other NaN'd still fail.
        kinds = {a[col].dtype.kind, b[col].dtype.kind}
        nullnan_ok = "O" in kinds or "b" in kinds
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            xnan = isinstance(x, float) and math.isnan(x)
            ynan = isinstance(y, float) and math.isnan(y)
            if xnan and ynan:
                continue
            if (x is None) != (y is None) or xnan != ynan:
                if nullnan_ok and ((x is None and ynan) or (xnan and y is None)):
                    continue
                n_bad += 1
                if first is None:
                    first = f"col={col} row={i}: {x!r} vs {y!r} (null/nan)"
                continue
            if isinstance(x, float) or isinstance(y, float):
                try:
                    fx, fy = float(x), float(y)
                except (TypeError, ValueError):
                    n_bad += 1
                    if first is None:
                        first = f"col={col} row={i}: {x!r} vs {y!r} (type)"
                    continue
                if fx == fy:
                    continue
                if abs(fx - fy) <= 1e-9 * max(1.0, abs(fx), abs(fy)):
                    n_close += 1  # would FAIL a strict hash compare!
                    if first is None:
                        first = f"col={col} row={i}: {fx!r} vs {fy!r} (CLOSE-not-equal)"
                else:
                    n_bad += 1
                    if first is None:
                        first = f"col={col} row={i}: {fx!r} vs {fy!r}"
            else:
                sx, sy = str(x), str(y)
                if sx != sy:
                    n_bad += 1
                    if first is None:
                        first = f"col={col} row={i}: {x!r} vs {y!r}"
    return n_bad, first, n_close


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    # Verify.scala writes per-query exception messages here; surface the
    # cause inline instead of a bare NO-SPARK-OUTPUT.
    spark_errors = {}
    err_path = os.path.join(out_dir, "errors.json")
    if os.path.exists(err_path):
        with open(err_path) as f:
            spark_errors = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written table (directory of part files) — e.g. the
            # fuzzer's --nulls derivative data; driver testdata is flat files
            p = os.path.join(p, "*.parquet")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d))
                   and not d.startswith("_"))  # _data = fuzzer --nulls tables
    for name in names:
        spark_df = load_spark_result(os.path.join(out_dir, name))
        if spark_df is None:
            cause = spark_errors.get(name, "no exception recorded")
            results[name] = f"NO-SPARK-OUTPUT ({cause})"; n_fail += 1; continue
        if name not in oracles:
            results[name] = f"rows-only ({len(spark_df)} rows)"
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR: {e}"; n_fail += 1; continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"COLUMNS: spark={list(a.columns)} duck={list(b.columns)}"
            n_fail += 1; continue
        if len(a) != len(b):
            results[name] = f"ROWCOUNT: spark={len(a)} duck={len(b)}"
            n_fail += 1; continue
        bad, first, close = cmp_values(a, b)
        if bad == 0 and close == 0:
            results[name] = f"PASS ({len(a)} rows)"; n_pass += 1
        elif bad == 0:
            results[name] = f"FLOAT-CLOSE x{close} ({first})"; n_fail += 1
        else:
            results[name] = f"VALUES x{bad}: {first}"; n_fail += 1
    width = max(len(n) for n in results) if results else 10
    for name in names:
        print(f"{name:<{width}}  {results[name]}")
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{sum(1 for v in results.values() if v.startswith('rows-only'))} rows-only, "
          f"{len(names)} total")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
