#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfdir> <verify_outdir>

Reads each <verify_outdir>/<name> parquet dir (written by graft.Verify),
runs <verify_outdir>/oracle_sql.json's SQL in DuckDB against the same
parquet tables, sorts columns by name + rows, and compares values.
"""
import sys, json, glob, math

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, colnames):
    """Sort columns by name, then rows; normalize values to comparable form."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = ("f", repr(v))
            elif v is None:
                v = ("null",)
            else:
                v = ("v", str(v))
            vals.append(v)
        out.append(tuple(vals))
    out.sort()
    return [c for _, c in sorted(zip(range(len(colnames)), colnames), key=lambda t: colnames[t[0]])], out


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted({p.split("/")[-1] for p in glob.glob(f"{outdir}/*") if not p.endswith(".json")})
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL  {name}: no parquet output")
            n_fail += 1
            continue
        tbl = pq.read_table(files[0])
        scols = tbl.column_names
        srows = [tuple(r[c] for c in scols) for r in tbl.to_pylist()]
        if name not in oracle:
            print(f"ROWS  {name}: rows={len(srows)} (no oracle, rows-only check)")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracle[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        sc, sr = canon(srows, scols)
        oc, orr = canon(orows, ocols)
        if sc != oc:
            print(f"FAIL  {name}: columns spark={sc} oracle={oc}")
            n_fail += 1
        elif sr != orr:
            diffs = [i for i, (a, b) in enumerate(zip(sr, orr)) if a != b][:3]
            print(f"FAIL  {name}: rows spark={len(sr)} oracle={len(orr)}; first diffs at {diffs}")
            for i in diffs:
                print(f"      spark : {sr[i] if i < len(sr) else '<missing>'}")
                print(f"      oracle: {orr[i] if i < len(orr) else '<missing>'}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sr)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
