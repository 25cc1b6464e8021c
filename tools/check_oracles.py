#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify's parquet
dumps + oracle_sql.json, run each oracle in DuckDB over the same testdata,
compare (columns sorted by name, rows sorted, values exact)."""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

def canon(rows):
    def c(v):
        if v is None: return "\x00NULL"
        if isinstance(v, float):
            if v != v: return "NaN"
            return repr(round(v, 9))
        if isinstance(v, bytes): return v.hex()
        return str(v)
    return sorted([tuple(c(v) for v in r) for r in rows])

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(f)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_rows_only = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no parquet output"); n_fail += 1; continue
        tbl = pq.read_table(files[0])
        got_cols = sorted(tbl.column_names)
        got = canon(zip(*[tbl.column(c).to_pylist() for c in got_cols])) if tbl.num_rows else []
        if name not in oracles:
            status = "ROWS-ONLY" if tbl.num_rows > 0 else "ROWS-ONLY-EMPTY!"
            print(f"[{status}] {name}: rows={tbl.num_rows}")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            exp_names = [d[0] for d in res.description]
            exp_rows = res.fetchall()
        except Exception as e:
            print(f"[FAIL] {name}: oracle error: {e}"); n_fail += 1; continue
        exp_cols = sorted(exp_names)
        if exp_cols != got_cols:
            print(f"[FAIL] {name}: columns spark={got_cols} duck={exp_cols}")
            n_fail += 1; continue
        idx = [exp_names.index(c) for c in exp_cols]
        exp = canon([[r[i] for i in idx] for r in exp_rows])
        if len(exp) != len(got):
            print(f"[FAIL] {name}: rowcount spark={len(got)} duck={len(exp)}")
            n_fail += 1; continue
        if exp != got:
            bad = [(g, e) for g, e in zip(got, exp) if g != e][:3]
            print(f"[FAIL] {name}: value mismatch; first diffs: {bad}")
            n_fail += 1; continue
        print(f"[PASS] {name}: rows={len(got)}")
        n_pass += 1
    print(f"\n== pass={n_pass} fail={n_fail} rows_only={n_rows_only}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
