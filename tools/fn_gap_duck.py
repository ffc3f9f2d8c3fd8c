#!/usr/bin/env python3
"""DuckDB side of the function-parity breadth probe: evaluate every
expression in tools/fn_gap_exprs.txt as `SELECT <expr> AS v` on DuckDB
1.0 and print the same TSV shape graft.FnGapProbe prints, so the two
outputs diff line-by-line.

Usage: python3 tools/fn_gap_duck.py [exprFile] > /tmp/fn_gap_duck.tsv
"""
import sys

import duckdb

path = sys.argv[1] if len(sys.argv) > 1 else "tools/fn_gap_exprs.txt"
con = duckdb.connect()
for line in open(path):
    e = line.strip()
    if not e or e.startswith("#"):
        continue
    stmt = e if e.upper().startswith("SELECT ") else f"SELECT {e} AS v"
    try:
        v = con.execute(stmt).fetchone()[0]
        print(f"OK\t{e}\t{v}")
    except Exception as ex:
        msg = str(ex).replace("\n", " ").replace("\t", " ")[:140]
        print(f"ERR\t{e}\t{msg}")
