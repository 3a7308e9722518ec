#!/usr/bin/env python3
"""Time the full DuckDB oracle suite against one Verify dump.

Measures the single-node wall clock DuckDB needs to execute every oracle SQL
in OUTDIR/oracle_sql.json over the tables under SFDIR (results fully
fetched), for comparison with graft.Bench's Spark total at the same scale —
the standing "within 2x of the single-node baseline" gate.

r18 (VERDICT r17 #3 — the 1.19x→1.41x swing was oracle-side box asymmetry
that the artifact could not prove): oracle_times.json now carries a "_meta"
object stamping the measurement window — DuckDB version, ISO timestamp,
wall seconds, repeats, and the SAME load probes Bench records Spark-side
(external busy cores measured across the whole run from /proc/stat minus
this process's own jiffies, plus loadavg before/after). "_total" carries
the suite sum so graft.Bench can embed the matched pair without parsing
per-query keys. A future ratio swing is attributable from the two
artifacts' _meta blocks alone. Use tools/matched_pair.py to take both
sides in one window.

Usage: python3 tools/oracle_timing.py <sfdir> <outdir> [repeats]
"""
import datetime
import json
import os
import sys
import time

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _proc_busy_jiffies():
    """Total non-idle jiffies across all cpus, or -1 if unreadable."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:11]]
        idle = vals[3] + vals[4]  # idle + iowait
        return sum(vals) - idle
    except Exception:
        return -1


def _self_jiffies():
    try:
        with open("/proc/self/stat") as f:
            parts = f.read().split()
        return int(parts[13]) + int(parts[14])  # utime + stime
    except Exception:
        return -1


def _loadavg1():
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except Exception:
        return -1.0


def main(sfdir: str, outdir: str, repeats: int = 1) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    best = {}
    errors = {}
    load_before = _loadavg1()
    busy0, self0, t_run0 = _proc_busy_jiffies(), _self_jiffies(), time.monotonic()
    for _ in range(max(1, repeats)):
        for name in sorted(oracle):
            if name in errors:
                continue
            t0 = time.monotonic()
            try:
                rows = len(con.execute(oracle[name]).fetchall())
            except Exception as e:  # stale dump path etc. — keep the rest usable
                errors[name] = str(e).split("\n")[0][:200]
                continue
            sec = time.monotonic() - t0
            if name not in best or sec < best[name][0]:
                best[name] = (sec, rows)
    wall = time.monotonic() - t_run0
    busy1, self1 = _proc_busy_jiffies(), _self_jiffies()
    ext_busy = -1.0
    if busy0 >= 0 and busy1 >= 0 and self0 >= 0 and self1 >= 0 and wall > 0:
        ext_busy = max(0.0, round(
            ((busy1 - busy0) - (self1 - self0)) / (100.0 * wall), 2))
    for name, err in errors.items():
        print(f"ERROR    {name}: {err}")
    total = sum(s for s, _ in best.values())
    meta = {
        "duckdb_version": duckdb.__version__,
        "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"),
        "sf": sfdir,
        "repeats": max(1, repeats),
        "wall_sec": round(wall, 1),
        "ext_busy_cores": ext_busy,
        "load_before": load_before,
        "load_after": _loadavg1(),
        "host_cpus": os.cpu_count() or -1,
    }
    # per-query times for tools/ratio_audit.py (the per-query 2x-gate join);
    # "_"-prefixed keys are measurement metadata, not queries
    out = {n: round(s, 4) for n, (s, _) in sorted(best.items())}
    out["_total"] = round(total, 3)
    out["_meta"] = meta
    with open(f"{outdir}/oracle_times.json", "w") as f:
        json.dump(out, f)
    for name in sorted(best, key=lambda n: -best[n][0])[:10]:
        print(f"{best[name][0]:8.3f}s {name} ({best[name][1]} rows)")
    print(json.dumps({"metric": "duckdb_oracle_total", "value": round(total, 3),
                      "unit": "sec", "n_queries": len(best),
                      "n_errors": len(errors), "sf": sfdir, "_meta": meta}))
    return 0


if __name__ == "__main__":
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    sys.exit(main(sys.argv[1], sys.argv[2], reps))
