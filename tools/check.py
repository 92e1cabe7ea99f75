#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <out_dir>/oracle_sql.json in DuckDB over the parquet
tables in <sf_dir>, and compares: column names (sorted), dtypes, row count,
and exact cell values (floats compared bit-exact). This is intentionally
HARSHER than the driver's hash compare — if this passes, the hash passes.
"""
import duckdb, glob, json, os, sys
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(outdir, sfdir):
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = pq.read_table(files).to_pandas()
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        errs = []
        if list(got.columns) != list(exp.columns):
            errs.append(f"cols spark={list(got.columns)} oracle={list(exp.columns)}")
        elif len(got) != len(exp):
            errs.append(f"rows spark={len(got)} oracle={len(exp)}")
        else:
            for c in got.columns:
                g, e = got[c], exp[c]
                if str(g.dtype) != str(e.dtype):
                    errs.append(f"dtype[{c}] spark={g.dtype} oracle={e.dtype}")
                gl, el = list(g), list(e)
                bad = [(i, a, b) for i, (a, b) in enumerate(zip(gl, el))
                       if (a != b) and not (a != a and b != b)]  # NaN==NaN ok
                if bad:
                    i, a, b = bad[0]
                    errs.append(f"val[{c}] {len(bad)} diffs, first@{i}: spark={a!r} oracle={b!r}")
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs[:4])); n_fail += 1
        else:
            # 0-row passes are vacuous (empty == empty) — flag loudly
            tag = " *** EMPTY RESULT: vacuous pass ***" if len(got) == 0 else ""
            print(f"PASS {name} ({len(got)} rows){tag}"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
