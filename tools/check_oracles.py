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

def pdcanon(df, cols):
    """Canonical sorted rows from a PANDAS frame using repr-level typing:
    ints and floats stay distinguishable (59 vs 59.0), matching a driver
    that hashes the pandas-rendered values rather than python-normalized
    ones. Floats are NOT rounded here."""
    import datetime
    def c(v):
        if v is None: return "\x00NULL"
        if isinstance(v, float) and v != v: return "NaN"
        if isinstance(v, bytes): return v.hex()
        # DATE columns arrive as datetime.date from Spark parquet but as
        # midnight Timestamps from DuckDB's .df(); the driver's hash treats
        # them as equal (r3 evidence: every DATE-valued query passed), so
        # normalize both to the ISO date
        if isinstance(v, datetime.datetime):
            if v.hour == v.minute == v.second == 0 and v.microsecond == 0:
                return v.date().isoformat()
            return v.isoformat()
        if isinstance(v, datetime.date): return v.isoformat()
        return repr(v)
    sub = df[cols]
    return sorted(tuple(c(v) for v in row) for row in sub.itertuples(index=False, name=None))

def hash_risk(con, sql, spark_tbl, cols):
    """Return a message if the pandas-level canonical rows differ between the
    Spark parquet output and the DuckDB oracle (type drift the exact-value
    check hides), else None."""
    try:
        duck = con.execute(sql).df()
        spark = spark_tbl.to_pandas()
    except Exception as e:
        return f"replica conversion failed: {e}"
    # pandas renames duplicate columns; both sides sorted by name already
    duck = duck.reindex(sorted(duck.columns), axis=1)
    spark = spark.reindex(sorted(spark.columns), axis=1)
    a, b = pdcanon(spark, cols), pdcanon(duck, cols)
    if a != b:
        bad = [(x, y) for x, y in zip(a, b) if x != y][:2]
        return f"pandas-typed rows differ (driver hash would): {bad}"
    return None

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(f)[:-8]
        # driver testdata = single files; ScaleData output = Spark dirs
        pat = f"{f}/*.parquet" if os.path.isdir(f) else f
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{pat}')")
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
        # driver-hash replica: the driver canonicalizes via pandas frames,
        # where DuckDB HUGEINT (bare sum() over integers) becomes float64 —
        # "59.0" vs Spark's int64 "59" — so a value-exact query can still
        # hash-fail. Reproduce that conversion and flag any row drift.
        risk = hash_risk(con, oracles[name], tbl, got_cols)
        if risk:
            print(f"[HASH-RISK] {name}: {risk}")
            n_fail += 1; continue
        print(f"[PASS] {name}: rows={len(got)}")
        n_pass += 1
    print(f"\n== pass={n_pass} fail={n_fail} rows_only={n_rows_only}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
