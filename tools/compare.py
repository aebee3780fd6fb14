#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL from
oracle_sql.json in DuckDB over the testdata parquet, load the Spark result
parquet written by graft.Verify, sort columns by name (and rows), and
compare values exactly. Usage: compare.py <sfDir> <outDir>"""
import json, sys, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))
import glob, os
results = {}
for name in sorted(oracles):
    sql = oracles[name]
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE_ERROR: {e}"
        continue
    pq = glob.glob(f"{outdir}/{name}/*.parquet")
    if not pq:
        results[name] = "MISSING_SPARK_RESULT"
        continue
    sdf = con.execute(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    if ocols != scols:
        results[name] = f"SCHEMA_MISMATCH oracle={ocols} spark={scols}"
        continue
    o = odf[ocols]; s = sdf[scols]
    if len(o) != len(s):
        results[name] = f"ROWCOUNT_MISMATCH oracle={len(o)} spark={len(s)}"
        continue
    def norm(df):
        rows = []
        for row in df.itertuples(index=False):
            out = []
            for v in row:
                if isinstance(v, float):
                    # .17g round-trips every double exactly; the old .9g was
                    # too coarse to see last-decimal divergences the driver's
                    # exact hash catches (r19's q118).
                    out.append(f"{v:.17g}" if not math.isnan(v) else "nan")
                elif hasattr(v, "tolist"):  # numpy arrays / lists
                    out.append(str(v.tolist() if hasattr(v, "tolist") else v))
                else:
                    out.append(str(v))
            rows.append("|".join(out))
        return sorted(rows)
    no, ns = norm(o), norm(s)
    if no == ns:
        results[name] = "OK"
    else:
        diffs = [(a, b) for a, b in zip(no, ns) if a != b][:3]
        results[name] = f"VALUE_MISMATCH e.g. {diffs}"

ok = sum(1 for v in results.values() if v == "OK")
for k, v in sorted(results.items()):
    print(("PASS " if v == "OK" else "FAIL ") + k + ("" if v == "OK" else "  " + str(v)[:300]))
print(f"\n{ok}/{len(results)} oracle-checked queries pass")
no_oracle = [d for d in sorted(os.listdir(outdir))
             if os.path.isdir(f"{outdir}/{d}") and d not in oracles]
for d in no_oracle:
    n = con.execute(f"SELECT count(*) FROM read_parquet('{outdir}/{d}/*.parquet')").fetchone()[0]
    print(f"ROWS-ONLY {d}: {n} rows")
