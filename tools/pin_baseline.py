#!/usr/bin/env python3
"""Re-measure the bench comparator (BASELINE.md protocol).

Usage: python3 tools/pin_baseline.py <sfDir> <oracleSqlJson> [runs]

One process run = fresh DuckDB connection (32 threads), each oracle query
timed as min over 2 passes with results fully fetched; prints the suite
total. Repeats `runs` times (default 5) and reports the median — the pin.
Dev tool only — not part of the library.
"""
import sys, json, time, statistics
import duckdb

def one_run(sf_dir, oracles):
    con = duckdb.connect()
    con.sql("SET threads TO 32")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    total = 0.0
    per = {}
    for name, sql in sorted(oracles.items()):
        best = None
        for _ in range(3):  # 3-pass min, matching graft.Bench's protocol
            t0 = time.monotonic()
            con.sql(sql).fetchall()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        per[name] = best
        total += best
    con.close()
    return total, per

def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    # Early abort for unattended pins (tools/quiet_pin_loop.py): a window
    # that degrades mid-pin shows up as a run total far above the best run
    # so far — stop burning the window and exit nonzero instead of writing
    # a poisoned median. Unset/0 = old behavior.
    import os
    abort_factor = float(os.environ.get("PIN_ABORT_FACTOR", "0"))
    oracles = json.load(open(oracle_path))
    totals = []
    pers = []
    for i in range(runs):
        total, per = one_run(sf_dir, oracles)
        totals.append(total)
        pers.append(per)
        print(f"run {i+1}: {total:.1f} s", flush=True)
        if abort_factor and total > abort_factor * min(totals):
            print(f"ABORT: run {i+1} ({total:.1f}) > {abort_factor}x best "
                  f"({min(totals):.1f}) — window degraded", flush=True)
            sys.exit(2)
    med = statistics.median(totals)
    print(f"median of {runs}: {med:.1f} s  (range {min(totals):.1f}-{max(totals):.1f})")
    # per-query medians across runs — the head-to-head table's DuckDB column
    per_med = {n: statistics.median(p[n] for p in pers) for n in pers[0]}
    out = {"median_total_sec": round(med, 2), "runs": runs, "sf_dir": sf_dir,
           "per_query_sec": {n: round(s, 4) for n, s in sorted(per_med.items())}}
    with open("baseline_per_query.json", "w") as f:
        json.dump(out, f, indent=1)
    print("heaviest:", sorted(per_med.items(), key=lambda kv: -kv[1])[:8])
    print("wrote baseline_per_query.json")

if __name__ == "__main__":
    main()
