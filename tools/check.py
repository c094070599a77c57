#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read each Verify output
parquet, run the matching oracle SQL in DuckDB over the same sf dir, and
compare schema + values (columns sorted by name, rows sorted)."""
import json, sys, math
from pathlib import Path

import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to ns, decimals to float
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            dt = df[c].dt
            df[c] = dt.tz_localize(None) if getattr(dt, "tz", None) is not None else df[c]
    return df.reset_index(drop=True)

def compare(a: pd.DataFrame, b: pd.DataFrame, name: str) -> list[str]:
    errs = []
    if list(a.columns) != list(b.columns):
        return [f"schema mismatch: spark={list(a.columns)} oracle={list(b.columns)}"]
    if len(a) != len(b):
        return [f"row count mismatch: spark={len(a)} oracle={len(b)}"]
    a = a.sort_values(by=list(a.columns)).reset_index(drop=True)
    b = b.sort_values(by=list(b.columns)).reset_index(drop=True)
    for c in a.columns:
        av, bv = a[c], b[c]
        # int-width mismatches (int32 vs int64) also diverge in the
        # driver's dtype-inclusive hash, not just int-vs-float
        if (av.dtype.kind in "iu" and bv.dtype.kind in "iu"
                and av.dtype.itemsize != bv.dtype.itemsize):
            errs.append(f"col {c}: int width mismatch spark={av.dtype} "
                        f"oracle={bv.dtype} (driver hash would fail)")
            continue
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            # Mirror the driver: an int64-vs-float64 dtype mismatch fails
            # outright (the driver hashes values incl. dtype repr), and any
            # value difference — however small — is a failure; `close` is
            # reported as a diagnostic only.
            if av.dtype.kind != bv.dtype.kind:
                errs.append(f"col {c}: dtype mismatch spark={av.dtype} "
                            f"oracle={bv.dtype} (driver hash would fail)")
                continue
            bad = ~((av.isna() & bv.isna()) | (av == bv))
            nexact = int(bad.sum())
            if nexact:
                close = ((av - bv).abs() < 1e-9 * (1 + bv.abs()))[bad].all()
                errs.append(f"col {c}: {nexact} float diffs (FAIL even if "
                            f"close={close}) "
                            f"e.g. {av[bad].iloc[0]!r} vs {bv[bad].iloc[0]!r}")
        else:
            astr, bstr = av.astype(str), bv.astype(str)
            bad = ~(astr == bstr)
            if bad.any():
                i = bad.idxmax()
                errs.append(f"col {c}: {int(bad.sum())} diffs, e.g. row {i}: "
                            f"{av[i]!r} vs {bv[i]!r}")
    return errs

def main():
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify")
    sf_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_ok = 0
    failed = []
    names = sorted(set(list(oracle.keys()) + [p.name for p in out_dir.iterdir() if p.is_dir()]))
    for name in names:
        spark_path = out_dir / name
        if not spark_path.is_dir():
            print(f"  FAIL {name}: no spark output"); failed.append(name); continue
        sdf = canon(pd.read_parquet(spark_path))
        if name not in oracle:
            print(f"  SKIP {name}: no oracle ({len(sdf)} rows)"); continue
        try:
            odf = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"  FAIL {name}: oracle error: {e}"); failed.append(name); continue
        errs = compare(sdf, odf, name)
        if errs:
            print(f"  FAIL {name} ({len(sdf)} rows):")
            for e in errs[:5]:
                print(f"    {e}")
            failed.append(name)
        else:
            print(f"  OK   {name} ({len(sdf)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {len(failed)} failed" + (f": {failed}" if failed else ""))
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main()
