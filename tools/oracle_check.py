#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [--skip a,b] [--only a,b]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB with the parquet tables of <sfDir> registered under
their bare names, and compares against the Spark result parquet in
<verifyOutDir>/<name>/. Compare = sort columns by name, sort rows,
compare values (exact; floats via repr).

--skip/--only bound large-SF runs: a few oracles are deliberately
quadratic (all-pairs verification twins) or recursive (transitive
closure) in SQL and are infeasible in DuckDB at 100x, even though the
Spark side runs fine; skip them there and rely on the small-SF gates
for their semantics.
"""
import json
import sys
import glob
import os

import duckdb
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(rows):
    def cell(v):
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, bytes):
            return v.hex()
        if isinstance(v, list):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    return sorted(tuple(cell(v) for v in r) for r in rows)


def read_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None, None, []
    t = pq.read_table(files[0])
    cols = sorted(t.column_names)
    t = t.select(cols)
    # Decimal-typed outputs hash-fail in the DRIVER gate even when the
    # precision is pinned on both sides (CORRECTNESS_r02: every decimal
    # output failed, every double/bigint output passed). Locally both
    # engines hand back decimal.Decimal so str()-compare hides it —
    # flag the column type itself instead.
    decimal_cols = [f.name for f in t.schema
                    if "decimal" in str(f.type).lower()]
    return cols, [tuple(r[c] for c in cols) for r in t.to_pylist()], decimal_cols


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    skip, only = set(), None
    args = sys.argv[3:]
    while args:
        if args[0] in ("--skip", "--only") and len(args) < 2:
            sys.exit(f"{args[0]} needs a comma-separated list of query names")
        if args[0] == "--skip":
            skip |= set(args[1].split(","))
            args = args[2:]
        elif args[0] == "--only":
            only = (only or set()) | set(args[1].split(","))
            args = args[2:]
        else:
            sys.exit(f"unknown arg {args[0]}")
    con = duckdb.connect()
    for tb in TABLES:
        p = os.path.join(sfdir, f"{tb}.parquet")
        if os.path.isdir(p):  # Spark-written table dir (graft.ScaleUp)
            src = f"read_parquet('{p}/*.parquet')"
            sel = "*"
            if tb == "events":
                # Spark reads TIMESTAMP(NANOS) as epoch-nano BIGINT and
                # writes it back as such; restore the original type so
                # the oracles' epoch()/time_bucket() calls bind
                ts_t = con.execute(
                    f"SELECT typeof(ts) FROM {src} LIMIT 1").fetchone()[0]
                if ts_t == "BIGINT":
                    # micros are enough: every oracle output floors to
                    # seconds, and 1000 | 1e9 keeps boundaries aligned
                    sel = "* REPLACE (make_timestamp(ts // 1000) AS ts)"
            con.execute(f"CREATE VIEW {tb} AS SELECT {sel} FROM {src}")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {tb} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    # a typo'd --skip/--only name must be an error, not a silently
    # green gate that verified nothing
    unknown = (skip | (only or set())) - set(oracles)
    if unknown:
        sys.exit(f"unknown query names in --skip/--only: {sorted(unknown)}")
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if name in skip or (only is not None and name not in only):
            print(f"SKIP {name}")
            continue
        scols, srows, decimal_cols = read_spark(outdir, name)
        if scols is None:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        if decimal_cols:
            print(f"FAIL {name}: decimal-typed output columns {decimal_cols} "
                  f"(driver hash unsafe — emit DOUBLE/BIGINT instead)")
            n_fail += 1
            continue
        try:
            rel = con.sql(sql)
            # Mirror of the Spark-side decimal guard: DuckDB HUGEINT /
            # DECIMAL outputs (e.g. windowed sum(BIGINT) widens to
            # HUGEINT, and // % propagate it) hash differently in the
            # driver even when str-canonicalized values agree here.
            bad = [c for c, t in zip(rel.columns, rel.types)
                   if any(k in str(t).upper() for k in ("HUGEINT", "DECIMAL"))]
            if bad:
                print(f"FAIL {name}: oracle emits HUGEINT/DECIMAL columns {bad} "
                      f"(driver hash unsafe — CAST to BIGINT/DOUBLE in the SQL)")
                n_fail += 1
                continue
            res = con.execute(sql)
            ocols = sorted(d[0] for d in res.description)
            raw = res.fetchall()
            names = [d[0] for d in res.description]
            idx = [names.index(c) for c in ocols]
            orows = [tuple(r[i] for i in idx) for r in raw]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        cs, co = canon(srows), canon(orows)
        if cs == co:
            print(f"PASS {name} ({len(cs)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(cs)} oracle={len(co)}")
            for a, b in list(zip(cs, co))[:200]:
                if a != b:
                    print(f"  spark : {a}\n  oracle: {b}")
                    break
    # queries with no oracle: rows-only check
    for name in glob.glob(os.path.join(outdir, "*", "")):
        qn = os.path.basename(name.rstrip("/"))
        if qn not in oracles:
            _, rows, _ = read_spark(outdir, qn)
            print(f"INFO {qn}: no oracle, {len(rows) if rows is not None else 0} rows")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    # "nothing ran" must not read as green
    sys.exit(1 if n_fail or n_pass == 0 else 0)


if __name__ == "__main__":
    main()
