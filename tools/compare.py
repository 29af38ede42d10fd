#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Loads each <outDir>/<name> parquet (Spark result), runs the matching SQL
from oracle_sql.json in DuckDB over the sfDir tables, sorts columns by
name, and compares row counts, dtypes, and exact values (doubles must be
bit-identical — Stable.dsum guarantees that by design).
"""
import sys, json, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    failures = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
        if not files:
            print(f"FAIL {name}: no spark output"); failures += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").df()
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); failures += 1; continue
        got = got[sorted(got.columns)].reset_index(drop=True)
        exp = exp[sorted(exp.columns)].reset_index(drop=True)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            failures += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); failures += 1; continue
        bad = []
        for c in got.columns:
            gv, ev = got[c], exp[c]
            try:
                eq = (gv.values == ev.values) | (gv.isna().values & ev.isna().values)
            except Exception:
                eq = gv.astype(str).values == ev.astype(str).values
            if not eq.all():
                i = int((~eq).argmax())
                bad.append(f"{c}[{i}]: {gv.iloc[i]!r} != {ev.iloc[i]!r}")
        dt = [f"{c}: {got[c].dtype} vs {exp[c].dtype}" for c in got.columns
              if str(got[c].dtype) != str(exp[c].dtype)]
        if bad:
            print(f"FAIL {name}: {'; '.join(bad[:3])}"); failures += 1
        elif dt:
            print(f"WARN {name}: rows ok, dtype diff: {'; '.join(dt)}")
        else:
            print(f"PASS {name}: {len(got)} rows")
    print(f"\n{len(oracle)-failures}/{len(oracle)} queries pass")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
