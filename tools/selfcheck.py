#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB-oracle comparison.

Usage: python3 tools/selfcheck.py <sfdir> <verify_out_dir>

For each query dumped by graft.Verify, runs the oracle SQL from
oracle_sql.json in DuckDB over the same parquet tables, then compares
row counts, sorted columns, and exact values against the Spark result.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = os.path.join(outdir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        # driver behavior: sort columns by name, then compare values
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"FAIL {name}: columns oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        odf = odf[ocols].sort_values(ocols, ignore_index=True)
        sdf = sdf[scols].sort_values(scols, ignore_index=True)
        if len(odf) != len(sdf):
            print(f"FAIL {name}: rows oracle={len(odf)} spark={len(sdf)}")
            n_fail += 1
            continue
        mismatch = None
        for c in ocols:
            ov, sv = odf[c], sdf[c]
            if str(ov.dtype) != str(sv.dtype):
                mismatch = f"dtype[{c}] oracle={ov.dtype} spark={sv.dtype}"
                break
            if not ov.equals(sv):
                neq = (ov != sv) & ~(ov.isna() & sv.isna())
                idx = neq[neq].index[:3].tolist()
                mismatch = f"values[{c}] at rows {idx}: oracle={ov[idx].tolist()} spark={sv[idx].tolist()}"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(odf)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
