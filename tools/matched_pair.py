#!/usr/bin/env python3
"""Same-window matched-pair measurement (VERDICT r17 #3).

The headline Spark-vs-DuckDB ratio was formerly assembled from two suites
timed in DIFFERENT sessions (Spark pins from Bench runs, DuckDB totals from
a separate oracle_timing invocation), so a ±20% box asymmetry between the
two windows could masquerade as — or mask — an engine regression (the r17
1.19x→1.41x swing, adjudicated oracle-side only by after-the-fact
forensics). This driver takes BOTH sides back-to-back inside one window,
load-probed on both sides:

  1. graft.Bench (Spark suite, its own in-artifact load probes/trace)
  2. tools/oracle_timing.py (DuckDB suite, its _meta probes) — immediately
     after, same box state

and writes matched_pair.json carrying the pair, the ratio, and both _meta
blocks. The Verify dump must already exist (oracle_sql.json under OUTDIR);
Bench reads SPARK_GRAFT_SF_DIR so both sides see the same sf.

Usage: python3 tools/matched_pair.py <sfdir> <outdir> [oracle_repeats]
"""
import datetime
import json
import os
import subprocess
import sys
import time

import oracle_timing


def main(sfdir: str, outdir: str, repeats: int = 2) -> int:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sfdir,
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    t0 = time.monotonic()
    proc = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    bench_line = None
    for line in proc.stdout.splitlines():
        # prefer the full contract line (carries "queries"); fall back to
        # the compact summary (same headline fields)
        if '"metric"' in line:
            parsed = json.loads(line[line.index("{"):])
            if bench_line is None or "queries" in parsed:
                bench_line = parsed
    if bench_line is None:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
        raise SystemExit("no Bench JSON line found")
    spark_sec = time.monotonic() - t0
    # DuckDB side immediately after, same window
    oracle_timing.main(sfdir, outdir, repeats)
    duck = json.load(open(f"{outdir}/oracle_times.json"))
    spark_total = bench_line["value"]
    duck_total = duck["_total"]
    pair = {
        "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"),
        "sf": sfdir,
        "spark_total": spark_total,
        "duckdb_total": duck_total,
        "ratio": round(spark_total / duck_total, 3) if duck_total else None,
        "spark_wall_sec": round(spark_sec, 1),
        "spark_meta": {k: bench_line.get(k) for k in (
            "gc_sec", "load_before", "load_after", "external_busy_cores",
            "ext_busy_blocks", "regressions", "cache_selfheals", "t0")
            if k in bench_line},
        "duckdb_meta": duck["_meta"],
    }
    with open(f"{outdir}/matched_pair.json", "w") as f:
        json.dump(pair, f, indent=1)
    print(json.dumps(pair))
    return 0


if __name__ == "__main__":
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    sys.exit(main(sys.argv[1], sys.argv[2], reps))
