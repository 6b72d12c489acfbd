#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify output
parquet + oracle_sql.json, run each oracle in DuckDB over the same sf
dir, and compare (columns sorted by name, row-sorted, value-compare).
Usage: check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return round(v, 9)
    return v

def family(dtype):
    """Collapse dtypes to families so int32 vs int64 (benign width) passes
    but int vs float FAILS — the DuckDB sum(BIGINT)->HUGEINT->float64
    class that shipped red in r4 (q70) and r5 (q83) while the value
    compare stayed green (5 == 5.0 in Python)."""
    s = str(dtype)
    if "int" in s: return "int"
    if "float" in s or "double" in s: return "float"
    if "bool" in s: return "bool"
    return s

fails = []
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d): continue
    got = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    if name not in oracle:
        status = f"rows-only: {len(got)} rows"
        if len(got) == 0:
            fails.append(name); status += "  << EMPTY"
        print(f"{name:28s} {status}")
        continue
    exp = con.execute(oracle[name]).fetchdf()
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    ok = True
    if list(got.columns) != list(exp.columns):
        ok = False
        print(f"{name:28s} SCHEMA MISMATCH spark={list(got.columns)} oracle={list(exp.columns)}")
    elif [family(t) for t in got.dtypes] != [family(t) for t in exp.dtypes]:
        ok = False
        bad = [(c, str(a), str(b)) for c, a, b in
               zip(got.columns, got.dtypes, exp.dtypes)
               if family(a) != family(b)]
        print(f"{name:28s} TYPE MISMATCH (col, spark, oracle): {bad}")
    elif len(got) != len(exp):
        ok = False
        print(f"{name:28s} ROWCOUNT spark={len(got)} oracle={len(exp)}")
    else:
        gs = sorted([tuple(norm(v) for v in r) for r in got.itertuples(index=False)], key=str)
        es = sorted([tuple(norm(v) for v in r) for r in exp.itertuples(index=False)], key=str)
        if gs != es:
            ok = False
            bad = [(a, b) for a, b in zip(gs, es) if a != b][:3]
            print(f"{name:28s} VALUE MISMATCH e.g. {bad}")
    if ok:
        print(f"{name:28s} OK ({len(got)} rows)")
    else:
        fails.append(name)

# an oracle with no output dir means the query ERRORED inside Verify
# (it logs and continues) — that must be a red row, not a silent skip
have = {n for n in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, n))}
for name in sorted(set(oracle) - have):
    print(f"{name:28s} MISSING OUTPUT (query errored in Verify?)")
    fails.append(name)

print()
print(f"FAILED: {fails}" if fails else "ALL GREEN")
sys.exit(1 if fails else 0)
