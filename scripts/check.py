#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out>/<name> parquet (Spark result), runs the matching oracle
SQL from <out>/oracle_sql.json in DuckDB over the sf_dir tables, and
compares: schema (column names), row count, and values (columns sorted
by name, rows sorted by all columns).
"""
import sys, os, json, math
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def _cell(v):
    if isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0:
        return tuple(_cell(x) for x in v)
    return v.item() if hasattr(v, "item") else v

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(_cell)
        # parquet date32 arrives as object(datetime.date) while duckdb
        # DATE arrives as datetime64 -- the driver compares these equal,
        # so coerce date-objects up to datetime64 before sorting/compare
        if df[c].dtype == object:
            nn = df[c].dropna()
            if len(nn) and all(type(v).__name__ == "date" for v in nn):
                df[c] = pd.to_datetime(df[c])
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.map(lambda v: str(v)) if s.dtype == object else s)
    return df

def cmp_values(a, b) -> bool:
    a_na = not isinstance(a, (list, tuple)) and pd.isna(a)
    b_na = not isinstance(b, (list, tuple)) and pd.isna(b)
    if a_na or b_na: return bool(a_na and b_na)
    if isinstance(a, float) and isinstance(b, float):
        return a == b
    return a == b

def main():
    out, sf = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if only and name not in only: continue
        sql = oracle[name]
        pdir = os.path.join(out, name)
        if not os.path.isdir(pdir):
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        try:
            got = pd.read_parquet(pdir)
        except Exception as e:
            print(f"FAIL {name}: read spark output: {e}"); n_fail += 1; continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns got={sorted(got.columns)} exp={sorted(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows got={len(got)} exp={len(exp)}")
            n_fail += 1; continue
        g, e = norm(got), norm(exp)
        # the driver's hash is dtype-KIND-sensitive (int vs float, bool vs
        # object) even when values compare equal; width (int32 vs int64)
        # and datetime unit (ns vs us) are tolerated -- flag kind drift
        # (after norm(), which resolves date32-object vs datetime64)
        dt_bad = [f"{c}: spark={g[c].dtype} duck={e[c].dtype}"
                  for c in sorted(g.columns)
                  if g[c].dtype.kind != e[c].dtype.kind
                  and {g[c].dtype.kind, e[c].dtype.kind} != {"i", "u"}
                  # an all-NULL column has no kind on either side
                  # (duckdb renders it float64-NaN, parquet object-None)
                  and not (g[c].isna().all() and e[c].isna().all())]
        if dt_bad:
            print(f"FAIL {name}: dtype mismatch [{'; '.join(dt_bad)}]")
            n_fail += 1; continue
        bad = None
        for c in g.columns:
            gv, ev = g[c].tolist(), e[c].tolist()
            for i, (x, y) in enumerate(zip(gv, ev)):
                # numpy scalars -> python
                x = x.item() if hasattr(x, "item") else x
                y = y.item() if hasattr(y, "item") else y
                if isinstance(x, (list, tuple)) or str(type(x)).find("ndarray") >= 0:
                    x, y = list(x), list(y)
                if not cmp_values(x, y):
                    bad = (c, i, x, y); break
            if bad: break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: value mismatch col={c} row={i} got={x!r} exp={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
