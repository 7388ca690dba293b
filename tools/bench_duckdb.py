#!/usr/bin/env python3
"""Dev-only: time each oracle SQL in DuckDB at a given scale factor — the
operative performance baseline (BASELINE.md). Compare against the JSON
line Bench.scala prints.

Usage: python3 tools/bench_duckdb.py <verify_out_dir> <sf_dir> [timeout_s]

An optional per-query timeout (round 17, for the sf>=10 rungs where the
documented-quadratic queries run for hours): each query runs in its own
PROCESS, hard-killed after timeout_s (connection interrupt proved
ineffective mid-pipeline — a first attempt wedged >20 min past its cap),
and is recorded at the FLOOR value timeout_s with a "timeouts" list in
the JSON — the printed total is then an honest LOWER BOUND on DuckDB's
wall, so any Spark<DuckDB ratio drawn from it holds a fortiori. With a
timeout, per-query results also flush incrementally to
<out_dir>/duckdb_times.jsonl so a killed run loses nothing.
"""
import sys, os, json, time, multiprocessing
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def make_views(con, sf_dir):
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written table (directory of part files) — e.g. the
            # synthesized sf≈1 replicas; driver testdata is flat files
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{os.path.join(p, '*.parquet')}')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")


def run_one(sf_dir, sql, q):
    con = duckdb.connect()
    make_views(con, sf_dir)
    t0 = time.time()
    try:
        con.execute(sql).fetchall()
        q.put(("ok", round(time.time() - t0, 3)))
    except Exception as e:
        q.put(("err", str(e)[:300]))


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else None
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    times = {}
    timeouts = []
    jsonl = None
    if timeout is not None:
        jsonl = open(os.path.join(out_dir, "duckdb_times.jsonl"), "w")
    con = None if timeout is not None else duckdb.connect()
    if con is not None:
        make_views(con, sf_dir)
    for name in sorted(oracles):
        if timeout is None:
            t0 = time.time()
            try:
                con.execute(oracles[name]).fetchall()
                times[name] = round(time.time() - t0, 3)
            except Exception as e:
                times[name] = None
                print(f"{name}: ERROR {e}", file=sys.stderr)
            continue
        q = multiprocessing.Queue()
        proc = multiprocessing.Process(
            target=run_one, args=(sf_dir, oracles[name], q))
        proc.start()
        proc.join(timeout)
        if proc.is_alive():
            proc.kill()
            proc.join()
            times[name] = timeout  # floor value: honest lower bound
            timeouts.append(name)
            print(f"{name}: TIMEOUT >= {timeout}s", file=sys.stderr, flush=True)
        else:
            # q.empty() races the Queue feeder thread: after join() a fast
            # child's result may not be visible yet — block briefly instead
            try:
                kind, val = q.get(timeout=5)
            except Exception:
                kind, val = ("err", "no result")
            if kind == "ok":
                times[name] = val
            else:
                times[name] = None
                print(f"{name}: ERROR {val}", file=sys.stderr, flush=True)
        jsonl.write(json.dumps({name: times[name]}) + "\n")
        jsonl.flush()
    total = sum(v for v in times.values() if v is not None)
    out = {"metric": "duckdb_total", "value": round(total, 3),
           "unit": "sec", "queries": times, "sf": sf_dir}
    if timeouts:
        out["timeouts"] = timeouts
        out["lower_bound"] = True
    print(json.dumps(out))

if __name__ == "__main__":
    main()
