#!/usr/bin/env python3
"""Mechanical sweep for oracle-typing escapes (the round-9 q163 class).

For every oracle in OUTDIR/oracle_sql.json, DESCRIBE the query in DuckDB
against the SFDIR tables and flag any output column whose DuckDB type is
HUGEINT / DECIMAL / INT128: those fetch into pandas as float64 (or Decimal
objects) and hash-mismatch an integral Spark column even when the values are
identical. Every integral aggregate in an oracle must be CAST(... AS BIGINT)
(or the whole column DOUBLE on both sides, per the float contract in
Pipelines.scala).

Usage: python3 tools/oracle_dtypes.py <sfdir> <outdir>
Exit 0 = no flagged columns.
"""
import json
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

FLAG = ("HUGEINT", "INT128", "DECIMAL")


def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    flagged = 0
    for name in sorted(oracle):
        try:
            desc = con.execute(f"DESCRIBE ({oracle[name]})").fetchall()
        except Exception as e:
            print(f"ERR  {name}: {str(e).splitlines()[0][:120]}")
            flagged += 1
            continue
        bad = [(c, t) for c, t, *_ in desc
               if any(t.upper().startswith(f) for f in FLAG)]
        if bad:
            print(f"FLAG {name}: " + ", ".join(f"{c}:{t}" for c, t in bad))
            flagged += 1
    print("CLEAN" if flagged == 0 else f"{flagged} queries flagged")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
