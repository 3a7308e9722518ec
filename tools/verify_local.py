#!/usr/bin/env python3
"""Local (dev-only, driver-style) correctness check.

Reads each Spark result parquet under OUTDIR/<name>/ and compares it with the
DuckDB result of the matching oracle SQL from OUTDIR/oracle_sql.json, on the
tables under SFDIR. Mirrors the driver's compare: sort columns by name, sort
rows, exact value compare (timestamps normalized to naive UTC microseconds).

Usage: python3 tools/verify_local.py <sfdir> <outdir>
"""
import datetime
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def kind(s: pd.Series) -> str:
    """Canonical dtype class, mirroring the driver's hash sensitivity.

    The driver hashes canonicalized values, so an integral Spark column vs a
    DuckDB HUGEINT/DECIMAL fetched as float64 (3 vs 3.0) is a hash MISMATCH
    even when numerically equal. Comparing dtype classes here catches that
    locally (the round-9 q163 escape) instead of at the driver.
    """
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "ts"
    return "obj"


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.dt.floor("us")
        elif s.dtype == object:
            nn = s.dropna()
            if len(nn) and all(isinstance(v, datetime.date)
                               and not isinstance(v, datetime.datetime)
                               for v in nn):
                # Spark DATE reads back as datetime.date objects; DuckDB DATE
                # fetches as datetime64[us]. The driver equates them — do the
                # same so the dtype-kind gate below doesn't false-positive.
                df[c] = pd.to_datetime(s)
            else:
                df[c] = s.map(lambda v: tuple(v) if isinstance(v, (list, tuple))
                              or str(type(v)).endswith("ndarray'>") else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="first").reset_index(drop=True)
    return df


def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    fails = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        try:
            exp = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            fails += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            fails += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            fails += 1
            continue
        dk = [(c, kind(got[c]), kind(exp[c])) for c in got.columns
              if kind(got[c]) != kind(exp[c])]
        if dk:
            c, a, b = dk[0]
            print(f"FAIL {name}: dtype col {c}: spark={got[c].dtype}({a}) "
                  f"oracle={exp[c].dtype}({b}) — driver hash would mismatch")
            fails += 1
            continue
        bad = None
        for c in got.columns:
            a, b = got[c], exp[c]
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                i = eq.idxmin()
                bad = (c, a[i], b[i], int((~eq).sum()))
                break
        if bad:
            c, av, bv, n = bad
            print(f"FAIL {name}: col {c}: {n} diffs, e.g. spark={av!r} oracle={bv!r}")
            fails += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
    # queries without oracle: rows-only
    for d in sorted(glob.glob(f"{outdir}/*/")):
        nm = d.rstrip("/").split("/")[-1]
        if nm not in oracle:
            n = sum(len(pd.read_parquet(f)) for f in glob.glob(f"{d}/*.parquet"))
            print(f"ROWS {nm}: {n}")
    print(f"{'ALL PASS' if fails == 0 else str(fails) + ' FAILURES'}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
