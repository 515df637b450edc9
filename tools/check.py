#!/usr/bin/env python3
"""Local oracle-parity harness mirroring the driver's t2 gate.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 tools/check.py <sfDir> <outDir>

For every <name>.parquet under outDir: run oracle_sql.json[name] in
DuckDB with each testdata table registered as a view, sort columns by
name, sort rows, and compare values exactly. Reports per-query
match/mismatch with first differing rows.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(repr(x) for x in t))
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_ok = n_bad = n_rows_only = 0
    for name in names:
        got = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
        if name not in oracle:
            status = "ROWS-ONLY"
            ok = len(grows) > 0
            n_rows_only += 1
            print(f"{'OK ' if ok else 'EMPTY'} {status:9} {name} ({len(grows)} rows)")
            if not ok:
                n_bad += 1
            continue
        exp = con.execute(oracle[name])
        ecols = [d[0] for d in exp.description]
        erows = exp.fetchall()
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        if gc != ec:
            n_bad += 1
            print(f"FAIL COLS      {name}: spark={gc} duck={ec}")
            continue
        # Dtype guard: the driver's hash is dtype-sensitive where value
        # compare isn't. HUGEINT (DuckDB's widening of SUM/`//` over
        # BIGINT) has no Spark counterpart and always hash-mismatches;
        # a one-sided DECIMAL does too. int32-vs-int64 is fine.
        gtypes = dict(zip(gcols, map(str, con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").types)))
        etypes = dict(zip(ecols, map(str, con.sql(oracle[name]).types)))
        bad_t = [(c, gtypes.get(c, "?"), etypes[c]) for c in ecols
                 if "HUGEINT" in etypes[c]
                 or etypes[c].startswith("DECIMAL") != gtypes.get(c, "").startswith("DECIMAL")]
        if bad_t:
            n_bad += 1
            print(f"FAIL DTYPE     {name}: " + ", ".join(
                f"{c} spark={g} duck={e}" for c, g, e in bad_t))
            continue
        if gr != er:
            n_bad += 1
            print(f"FAIL ROWS      {name}: spark={len(gr)} duck={len(er)} rows")
            for i, (a, b) in enumerate(zip(gr, er)):
                if a != b:
                    print(f"  first diff @ {i}:\n    spark={a}\n    duck ={b}")
                    break
            else:
                ml = min(len(gr), len(er))
                print(f"  extra rows from @{ml}: "
                      f"spark={gr[ml:ml+2]} duck={er[ml:ml+2]}")
            continue
        n_ok += 1
        print(f"OK  MATCH      {name} ({len(gr)} rows)")
    print(f"\n{n_ok} match, {n_rows_only} rows-only, {n_bad} FAIL "
          f"of {len(names)}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
