#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Runs each oracle SQL from outDir/oracle_sql.json in DuckDB against the same
parquet fixture tables, loads the Spark-side parquet output, sorts columns by
name and rows by value, and compares exactly (mimicking a hash compare).

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def kind(dt) -> str:
    """Pandas dtype kind the driver's hash effectively distinguishes.
    Empirically (r6): int32 vs int64 and decimal(p,s) vs double hash EQUAL
    on the driver, but DuckDB HUGEINT (-> pandas float64) vs Spark int64
    hashes DIFFERENT — i.e. the gate operates at pandas-dtype level after
    .df()/read_parquet conversion. Mimic exactly that: unify integer
    widths, keep int vs float vs bool vs object vs datetime apart."""
    k = getattr(dt, "kind", "O")
    return {"i": "int", "u": "int", "f": "float", "b": "bool",
            "M": "datetime", "m": "timedelta"}.get(k, "object")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    import decimal
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if df[c].dtype == object:
            vals = df[c].dropna()
            # Spark decimal parquet reads back as object-of-Decimal while
            # DuckDB decimal surfaces as float64 — and the driver hashes
            # decimal(p,s) vs double EQUAL, so mirror that here instead of
            # false-FAILing the type gate on the object/float pair
            if len(vals) and isinstance(vals.iloc[0], decimal.Decimal):
                df[c] = df[c].astype("float64")
                continue
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_bad += 1
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {outdir}/{name}")
            n_bad += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        e_c, g_c = canon(exp), canon(got)
        if list(e_c.columns) != list(g_c.columns):
            print(f"FAIL {name}: columns exp={list(e_c.columns)} got={list(g_c.columns)}")
            n_bad += 1
            continue
        # type gate (mirrors the driver's type-sensitive hash — see kind()).
        # datetime64 vs object-of-date is a tolerated pair: DuckDB DATE
        # surfaces as datetime64[us] while Spark date32 parquet reads back
        # as python datetime.date objects, and the driver hashes them equal
        # (every r6 date-bearing query passed).
        import datetime as _dt
        def date_pair(a, b):
            if kind(a.dtype) == "object":
                a, b = b, a
            if kind(a.dtype) != "datetime" or kind(b.dtype) != "object":
                return False
            vals = b.dropna()
            return len(vals) == 0 or isinstance(vals.iloc[0], (_dt.date, _dt.datetime))
        tdiff = [f"{c}: oracle={e_c[c].dtype} spark={g_c[c].dtype}"
                 for c in e_c.columns
                 if kind(e_c[c].dtype) != kind(g_c[c].dtype)
                 and not date_pair(e_c[c], g_c[c])]
        if tdiff:
            print(f"FAIL {name}: type mismatch — " + "; ".join(tdiff[:4]))
            n_bad += 1
            continue
        if len(e_c) != len(g_c):
            print(f"FAIL {name}: rows exp={len(e_c)} got={len(g_c)}")
            n_bad += 1
            continue
        mismatch = []
        for c in e_c.columns:
            ev, gv = e_c[c], g_c[c]
            try:
                eq = (ev.isna() & gv.isna()) | (ev == gv)
            except Exception:
                eq = pd.Series([a == b or (pd.isna(a) and pd.isna(b)) for a, b in zip(ev, gv)])
            if not bool(eq.all()):
                bad = int((~eq).sum())
                i = int(np.argmax(~eq.values))
                mismatch.append(f"{c}: {bad} diffs, first exp={ev.iloc[i]!r} got={gv.iloc[i]!r}")
        if mismatch:
            print(f"FAIL {name}: " + "; ".join(mismatch[:4]))
            n_bad += 1
        else:
            print(f"ok   {name} ({len(e_c)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
