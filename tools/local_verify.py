#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tool only; the
shipped library has no Python dependency). Runs DuckDB on oracle_sql.json
against the same sf-dir parquet tables and compares with the Spark outputs
dumped by graft.Verify: columns sorted by name, rows sorted, values
normalized, then compared cell-by-cell."""
import json, math, sys
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return v
    return v

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r)), \
           [cols[i] for i in order]

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_rel = con.execute(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        s_rows, s_cols = spark_rel.fetchall(), [d[0] for d in spark_rel.description]
        duck_rel = con.execute(sql)
        d_rows, d_cols = duck_rel.fetchall(), [d[0] for d in duck_rel.description]
    except Exception as e:
        print(f"FAIL {name}: exception {e}")
        fails += 1
        continue
    sr, sc = canon(s_rows, s_cols)
    dr, dc = canon(d_rows, d_cols)
    if sc != dc:
        print(f"FAIL {name}: columns spark={sc} duck={dc}")
        fails += 1
        continue
    if len(sr) != len(dr):
        print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
        fails += 1
        continue
    bad = 0
    for a, b in zip(sr, dr):
        if a != b:
            if bad < 3:
                print(f"  diff {name}: spark={a} duck={b}")
            bad += 1
    if bad:
        print(f"FAIL {name}: {bad}/{len(sr)} mismatched rows")
        fails += 1
    else:
        print(f"OK   {name}: {len(sr)} rows")
print(f"\n{'ALL OK' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
