#!/usr/bin/env python3
"""Time the full DuckDB oracle suite against one Verify dump.

Measures the single-node wall clock DuckDB needs to execute every oracle SQL
in OUTDIR/oracle_sql.json over the tables under SFDIR (results fully
fetched), for comparison with graft.Bench's Spark total at the same scale —
the standing "within 2x of the single-node baseline" gate.

Usage: python3 tools/oracle_timing.py <sfdir> <outdir> [repeats]
"""
import json
import sys
import time

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main(sfdir: str, outdir: str, repeats: int = 1) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    best = {}
    errors = {}
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
    for name, err in errors.items():
        print(f"ERROR    {name}: {err}")
    total = sum(s for s, _ in best.values())
    # per-query times for tools/ratio_audit.py (the per-query 2x-gate join)
    with open(f"{outdir}/oracle_times.json", "w") as f:
        json.dump({n: round(s, 4) for n, (s, _) in sorted(best.items())}, f)
    for name in sorted(best, key=lambda n: -best[n][0])[:10]:
        print(f"{best[name][0]:8.3f}s {name} ({best[name][1]} rows)")
    print(json.dumps({"metric": "duckdb_oracle_total", "value": round(total, 3),
                      "unit": "sec", "n_queries": len(best),
                      "n_errors": len(errors), "sf": sfdir}))
    return 0


if __name__ == "__main__":
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    sys.exit(main(sys.argv[1], sys.argv[2], reps))
