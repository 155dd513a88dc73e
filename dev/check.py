#!/usr/bin/env python3
"""Dev-only differential check (mimics the driver's t2 gate).

Usage: python3 dev/check.py [sfDir] [verifyOutDir]

Reads the parquet each SparkEntry query wrote (via graft.Verify), runs
the matching oracle SQL in local DuckDB over the same testdata parquet,
sorts columns by name, and compares shape + values row-by-row (order
matters — every declared query must end in a total ORDER BY).
"""
import sys, os, glob, json
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(v):
    """Canonical comparable form for a cell value."""
    import math, decimal, datetime
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)

fails, passes = [], []
for name in sorted(oracle):
    sql = oracle[name]
    files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    if not files:
        fails.append((name, "no spark output parquet"))
        continue
    try:
        srel = con.execute(
            f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in srel.description]
        srows = srel.fetchall()
        orel = con.execute(sql)
        ocols = [d[0] for d in orel.description]
        orows = orel.fetchall()
    except Exception as e:
        fails.append((name, f"exec error: {e}"))
        continue
    if sorted(scols) != sorted(ocols):
        fails.append((name, f"schema: spark={sorted(scols)} oracle={sorted(ocols)}"))
        continue
    if len(srows) != len(orows):
        fails.append((name, f"rowcount: spark={len(srows)} oracle={len(orows)}"))
        continue
    sidx = [scols.index(c) for c in sorted(scols)]
    oidx = [ocols.index(c) for c in sorted(ocols)]
    bad = None
    for i, (sr, orow) in enumerate(zip(srows, orows)):
        sv = [canon(sr[j]) for j in sidx]
        ov = [canon(orow[j]) for j in oidx]
        if sv != ov:
            bad = (i, sv, ov)
            break
    if bad:
        i, sv, ov = bad
        fails.append((name, f"row {i}: spark={sv} oracle={ov} (cols={sorted(scols)})"))
    else:
        passes.append((name, len(srows)))

for name, n in passes:
    print(f"PASS {name} ({n} rows)")
for name, why in fails:
    print(f"FAIL {name}: {why}")
# queries without oracle: report rows-only
declared = set(oracle)
for d in sorted(os.listdir(OUT)):
    if os.path.isdir(f"{OUT}/{d}") and d not in declared:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet({glob.glob(f'{OUT}/{d}/*.parquet')!r})"
        ).fetchone()[0]
        print(f"INFO {d}: no oracle, {n} rows")
print(f"\n{len(passes)} pass / {len(fails)} fail / {len(oracle)} declared")
sys.exit(1 if fails else 0)
