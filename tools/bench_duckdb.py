#!/usr/bin/env python3
"""Dev-only: time each oracle SQL in DuckDB at a given scale factor — the
operative performance baseline (BASELINE.md). Compare against the JSON
line Bench.scala prints.

Usage: python3 tools/bench_duckdb.py <verify_out_dir_with_oracle_json> <sf_dir>
"""
import sys, os, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written table (directory of part files) — e.g. the
            # synthesized sf≈1 replicas; driver testdata is flat files
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{os.path.join(p, '*.parquet')}')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    times = {}
    for name in sorted(oracles):
        t0 = time.time()
        try:
            con.execute(oracles[name]).fetchall()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:
            times[name] = None
            print(f"{name}: ERROR {e}", file=sys.stderr)
    total = sum(v for v in times.values() if v is not None)
    print(json.dumps({"metric": "duckdb_total", "value": round(total, 3),
                      "unit": "sec", "queries": times, "sf": sf_dir}))

if __name__ == "__main__":
    main()
