#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfdir> <verify_outdir> [--strict]

Reads each <verify_outdir>/<name> parquet dir (written by graft.Verify),
runs <verify_outdir>/oracle_sql.json's SQL in DuckDB against the same
parquet tables, sorts columns by name + rows, and compares values.

--strict additionally replicates the DRIVER's pandas-based gate, which
is stricter than the value comparison in two ways the round-11 verdict
caught: (1) the row hash is dtype-sensitive (pd.util.hash_pandas_object
distinguishes an int64 column from the float64 that DuckDB's HUGEINT —
e.g. SUM(BIGINT) — materializes to, even when every value is equal),
and (2) pandas sort_values raises on LIST-valued result columns
("unhashable type: numpy.ndarray"). A query is only driver-green when
BOTH modes pass; run --strict before shipping any catalog change.
"""
import os, sys, json, glob, math, hashlib

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
            elif isinstance(v, (bytes, bytearray)):
                # duckdb returns bytearray, pyarrow bytes — same payload
                v = ("b", bytes(v).hex())
            else:
                v = ("v", str(v))
            vals.append(v)
        out.append(tuple(vals))
    out.sort()
    return [c for _, c in sorted(zip(range(len(colnames)), colnames), key=lambda t: colnames[t[0]])], out


def strict_check(name, outdir, con, sql):
    """Mirror the driver's pandas canonicalization: read the Spark parquet
    with pandas, materialize the oracle with duckdb's .df() (HUGEINT →
    float64, exactly as the driver sees it), sort columns by name, sort
    rows by all columns, and compare dtype-sensitive row hashes."""
    import pandas as pd
    try:
        # Both sides materialize through duckdb's .df() — the only path
        # that reproduces the driver's observed r11 pass/fail split:
        # DATE → datetime64[us] on both sides (q_fm_scalar_parity green),
        # HUGEINT → float64 vs Spark's int64 (hash-fail when non-null,
        # green when NULLs float-ify the Spark side too), and LIST
        # columns → ndarray cells that sort_values cannot factorize.
        sdf = con.execute(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        odf = con.execute(sql).df()
        sdf = sdf[sorted(sdf.columns)]
        odf = odf[sorted(odf.columns)]
        if list(sdf.columns) != list(odf.columns):
            return ("schema", f"spark={list(sdf.columns)} oracle={list(odf.columns)}")
        if len(sdf) != len(odf):
            return ("rows", f"spark={len(sdf)} oracle={len(odf)}")
        cols = list(sdf.columns)
        sdf = sdf.sort_values(cols).reset_index(drop=True)
        odf = odf.sort_values(cols).reset_index(drop=True)
        hs = hashlib.sha256(pd.util.hash_pandas_object(sdf, index=False).values.tobytes()).hexdigest()
        ho = hashlib.sha256(pd.util.hash_pandas_object(odf, index=False).values.tobytes()).hexdigest()
        if hs != ho:
            detail = []
            for c in cols:
                if str(sdf[c].dtype) != str(odf[c].dtype):
                    detail.append(f"{c}: dtype spark={sdf[c].dtype} oracle={odf[c].dtype}")
            neq = (sdf != odf) & ~(sdf.isna() & odf.isna())
            bad = neq.any(axis=None)
            return ("hash", "; ".join(detail) if detail
                    else ("values differ" if bad else "equal values, hash-only divergence"))
        return None
    except Exception as e:
        return ("err", f"{type(e).__name__}: {e}")


def main():
    strict = "--strict" in sys.argv[1:]
    args = [a for a in sys.argv[1:] if a != "--strict"]
    sfdir, outdir = args[0], args[1]
    con = duckdb.connect()
    for t in TABLES:
        # testdata tables are flat files; Spark-synthesized corpora
        # (ScaleProbe's /tmp dirs) are part-file directories
        p = f"{sfdir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted({p.split("/")[-1] for p in glob.glob(f"{outdir}/*") if not p.endswith(".json")})
    n_pass = n_fail = n_rowsonly = n_strict = 0
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
            if strict:
                bad = strict_check(name, outdir, con, oracle[name])
                if bad is not None:
                    print(f"STRICT-FAIL  {name}: [{bad[0]}] {bad[1]}")
                    n_strict += 1
                    continue
            print(f"PASS  {name}: {len(sr)} rows")
            n_pass += 1
    tail = f", {n_strict} strict-fail" if strict else ""
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only{tail}")
    sys.exit(1 if (n_fail or n_strict) else 0)


if __name__ == "__main__":
    main()
