#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the parquet results written by `graft.Verify <sfDir> <outDir>`,
runs each oracle SQL from outDir/oracle_sql.json in DuckDB against the
same sfDir tables, and compares: row count, column names, and values
(columns sorted by name, rows sorted by all columns, exact equality).

Usage: python3 scripts/check.py [--json report.json] <sfDir> <outDir> [query...]

--json additionally writes a driver-style correctness report
({query: {rows_match, schema_match, hash_match, spark_rows,
oracle_rows, err}}) — used for the CORRECTNESS_SCALE artifacts.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in idx))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in idx], out


def norm(v):
    # Mirrors the driver, which canonicalizes through pandas: a DuckDB
    # HUGEINT (e.g. bare SUM(int)) arrives as float64 there and hashes
    # as "3.0" against Spark's int64 "3" — so we go through fetchdf()
    # too (see fetch()) and norm only handles pandas-ish scalars.
    import datetime, decimal, math
    import numpy as np
    if isinstance(v, (np.floating, float)):
        v = float(v)
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, np.ndarray)):
        return tuple(norm(x) for x in v)
    return v


def fetch(cursor):
    df = cursor.fetchdf()
    cols = list(df.columns)
    rows = [tuple(r) for r in df.itertuples(index=False, name=None)]
    return cols, rows


def main(sf_dir, out_dir, names=None, json_path=None):
    report = {}
    con = duckdb.connect()
    # an in-memory connection has NO temp_directory, so large sorts/
    # joins cannot spill and abort with OOM at the 100x replica —
    # point spilling at a disk path (same engine semantics, just
    # out-of-core execution for oracle queries that exceed RAM)
    tmp = os.environ.get("GRAFT_DUCKDB_TMP",
                         f"/tmp/graft_duckdb_spill_{os.getpid()}")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute("SET preserve_insertion_order=false")
    # peak memory scales with threads x per-operator buffers: the 100x
    # replica checks run fewer, fatter threads (default 32 exhausts
    # the 100 GiB limit before spilling kicks in)
    if os.environ.get("GRAFT_DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['GRAFT_DUCKDB_THREADS'])}")
    if os.environ.get("GRAFT_DUCKDB_MEM"):
        con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEM']}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table: a directory of parts
            p = f"{p}/*.parquet"
        if glob.glob(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    names = names or sorted(oracle)
    for name in names:
        sql = oracle[name]
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        rep = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        report[name] = rep
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            rep["err"] = "no spark result parquet"
            n_fail += 1
            continue
        try:
            gcols, grows = fetch(con.execute(f"SELECT * FROM read_parquet({files!r})"))
            wcols, wrows = fetch(con.execute(sql))
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            rep["err"] = f"exec error: {e}"
            n_fail += 1
            continue
        gc, gr = canon(grows, gcols)
        wc, wr = canon(wrows, wcols)
        rep["spark_rows"], rep["oracle_rows"] = len(gr), len(wr)
        rep["schema_match"] = gc == wc
        rep["rows_match"] = len(gr) == len(wr)
        rep["hash_match"] = gr == wr
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            n_fail += 1
        elif len(gr) != len(wr):
            print(f"FAIL {name}: rows {len(gr)} != {len(wr)}")
            n_fail += 1
        elif gr != wr:
            bad = next(i for i in range(len(gr)) if gr[i] != wr[i])
            print(f"FAIL {name}: value mismatch at sorted-row {bad}:")
            print(f"   spark : {gr[bad]}")
            print(f"   duckdb: {wr[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_path:
        json.dump(report, open(json_path, "w"), indent=1)
        print(f"report -> {json_path}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    argv = sys.argv[1:]
    jp = None
    if argv and argv[0] == "--json":
        jp = argv[1]
        argv = argv[2:]
    main(argv[0], argv[1], argv[2:] or None, jp)
