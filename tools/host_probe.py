#!/usr/bin/env python3
"""Cheap host-window probe (no JVM): times an ALU loop + a full-width
parquet scan-and-hash in DuckDB, the same blended profile as
graft.Bench.calibOnce. Prints one line: probe_secs and a quiet/warm call.

Calibration (2026-08-16, this host): quiet ~= ALU 0.62 + scan 0.55 when
Bench calib_secs reads ~0.80. Scale factors differ from the JVM probe;
judge the ratio vs the quiet pin printed below, not the absolute.
Usage: python3 tools/host_probe.py [sf_dir]
"""
import sys, time, duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
con = duckdb.connect()
con.execute("PRAGMA threads=32")

def once():
    t0 = time.time()
    con.execute("SELECT bit_xor(hash(r)) FROM range(0, 800000000) t(r)").fetchall()
    t_alu = time.time() - t0
    t1 = time.time()
    con.execute(f"SELECT bit_xor(hash(l)) FROM read_parquet('{sf}/lineitem.parquet') l").fetchall()
    con.execute(f"SELECT bit_xor(hash(e)) FROM read_parquet('{sf}/events.parquet') e").fetchall()
    t_scan = time.time() - t1
    return t_alu, t_scan

once()  # warm
a, s = once()
a2, s2 = once()
alu, scan = min(a, a2), min(s, s2)
print(f"probe alu={alu:.3f} scan={scan:.3f} total={alu+scan:.3f}")
