#!/usr/bin/env python
"""Dev-only oracle checker mimicking the driver's correctness gate.

Usage: python tools/check.py <sfDir> <verifyOutDir> [name-substring]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over views named after the
tables in <sfDir>, canonicalizes both sides (columns sorted by name, rows
sorted by all columns, floats rounded), and reports PASS/FAIL per query.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # array-typed cells (Spark ArrayType / DuckDB LIST) arrive as ndarray or
    # list objects — unhashable/unsortable; canonicalize to tuples.
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v.tolist()) if isinstance(v, np.ndarray)
                else (tuple(v) if isinstance(v, list) else v))
    # normalize timestamp cols to ns, tz-naive UTC
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = pd.to_datetime(df[c], utc=True)
            df[c] = s.dt.tz_localize(None).astype("datetime64[ns]")
    # Sort by non-float (key) columns first so sub-rtol float differences
    # between engines can't reorder rows; rounded floats only as trailing
    # tie-breakers.
    keys = [c for c in df.columns if not pd.api.types.is_float_dtype(df[c])]
    flts = [c for c in df.columns if pd.api.types.is_float_dtype(df[c])]
    tmp = {}
    for c in flts:
        rc = f"__round_{c}"
        df[rc] = df[c].round(6)
        tmp[c] = rc
    by = keys + [tmp[c] for c in flts]
    if by:
        df = df.sort_values(by=by, kind="mergesort", ignore_index=True)
    df = df.drop(columns=list(tmp.values()))
    return df

def compare(name, got: pd.DataFrame, exp: pd.DataFrame):
    errs = []
    if sorted(got.columns) != sorted(exp.columns):
        return [f"columns differ: got={sorted(got.columns)} exp={sorted(exp.columns)}"]
    if len(got) != len(exp):
        errs.append(f"row count differs: got={len(got)} exp={len(exp)}")
        return errs
    g, e = canon(got), canon(exp)
    for c in g.columns:
        gd, ed = g[c], e[c]
        if str(gd.dtype) != str(ed.dtype):
            errs.append(f"col {c}: dtype got={gd.dtype} exp={ed.dtype}")
    for c in g.columns:
        gd, ed = g[c], e[c]
        if pd.api.types.is_float_dtype(gd) and pd.api.types.is_float_dtype(ed):
            both_nan = gd.isna() & ed.isna()
            close = np.isclose(gd.fillna(0), ed.fillna(0), rtol=1e-9, atol=1e-12)
            bad = ~(both_nan | (close & (gd.isna() == ed.isna())))
            if bad.any():
                i = bad.idxmax()
                with np.errstate(divide="ignore", invalid="ignore"):
                    rel = np.nanmax(np.abs((gd - ed) / np.where(ed == 0, 1, ed)))
                errs.append(f"col {c}: {bad.sum()} float mismatches, first at row {i}: got={gd[i]} exp={ed[i]} (max rel diff {rel:.2e})")
        else:
            eq = (gd == ed) | (gd.isna() & ed.isna())
            if not eq.all():
                i = (~eq).idxmax()
                errs.append(f"col {c}: {(~eq).sum()} mismatches, first at row {i}: got={gd[i]!r} exp={ed[i]!r}")
    return errs

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    flt = sys.argv[3] if len(sys.argv) > 3 else ""
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)) and flt in d)
    npass = nfail = nskip = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"SKIP {name}: no parquet output"); nskip += 1; continue
        got = pd.concat([pd.read_parquet(p) for p in sorted(files)], ignore_index=True)
        if name not in oracles:
            print(f"NOORACLE {name}: rows={len(got)} (rows-only check)"); nskip += 1
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL error: {ex}"); nfail += 1; continue
        errs = compare(name, got, exp)
        if errs:
            print(f"FAIL {name}:")
            for e in errs: print(f"    {e}")
            nfail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); npass += 1
    print(f"\n{npass} pass, {nfail} fail, {nskip} skipped/no-oracle")
    sys.exit(1 if nfail else 0)

if __name__ == "__main__":
    main()
