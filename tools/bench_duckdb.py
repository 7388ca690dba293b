#!/usr/bin/env python3
"""Dev-only: time each oracle SQL in DuckDB at a given scale factor — the
operative performance baseline (BASELINE.md). Compare against the JSON
line Bench.scala prints.

Usage: python3 tools/bench_duckdb.py <verify_out_dir> <sf_dir> [timeout_s]

An optional per-query timeout (round 17, for the sf>=10 rungs where the
documented-quadratic queries run for hours): a watchdog interrupts the
connection after timeout_s and the query is recorded at the FLOOR value
timeout_s with a "timeouts" list in the JSON — the printed total is then
an honest LOWER BOUND on DuckDB's wall, so any Spark<DuckDB ratio drawn
from it holds a fortiori.
"""
import sys, os, json, time, threading
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else None
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
    timeouts = []
    for name in sorted(oracles):
        t0 = time.time()
        watchdog = None
        fired = threading.Event()
        if timeout is not None:
            def interrupt():
                fired.set()
                con.interrupt()
            watchdog = threading.Timer(timeout, interrupt)
            watchdog.start()
        try:
            con.execute(oracles[name]).fetchall()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:
            if fired.is_set():
                times[name] = timeout  # floor value: honest lower bound
                timeouts.append(name)
                print(f"{name}: TIMEOUT >= {timeout}s", file=sys.stderr)
            else:
                times[name] = None
                print(f"{name}: ERROR {e}", file=sys.stderr)
        finally:
            if watchdog is not None:
                watchdog.cancel()
    total = sum(v for v in times.values() if v is not None)
    out = {"metric": "duckdb_total", "value": round(total, 3),
           "unit": "sec", "queries": times, "sf": sf_dir}
    if timeouts:
        out["timeouts"] = timeouts
        out["lower_bound"] = True
    print(json.dumps(out))

if __name__ == "__main__":
    main()
