#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Reads Verify's parquet dumps + oracle_sql.json, runs each oracle SQL in
DuckDB over the same fixture dir, and diffs (columns sorted by name, rows
in result order). Both sides go through DuckDB fetchall so types stay
faithful (DATE stays date, DECIMAL stays Decimal). Dev tool only -- the
shipped engine is the Scala code.
"""
import glob
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    """Type-tagged canonical form, strict like the driver's serializer:
    repr() on floats distinguishes -0.0 from 0.0 and is bit-exact; the
    ("i",..)/("d",..) tags make an int-vs-double divergence (e.g. a DuckDB
    HUGEINT rendered as a double by the driver's arrow fetch) a mismatch
    even though Python == would call 1435 equal to 1435.0."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        return ("d", "NaN" if math.isnan(v) else repr(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def hugeint_cols(con, sql):
    """DuckDB widens SUM(BIGINT) to HUGEINT; the driver's serializer turns
    that into a double ("1435.0") and every hash diverges (r9 red rows
    q145/q148/q244/q248). Any HUGEINT output column is an oracle-authoring
    bug: CAST it to BIGINT (or DOUBLE) in the declared SQL."""
    try:
        d = con.execute(
            "DESCRIBE SELECT * FROM (" + sql.rstrip().rstrip(";") + ")"
        ).fetchall()
    except Exception as e:
        # a DESCRIBE failure silently disabling the gate would recreate the
        # exact r9 local-pass/driver-fail divergence this gate exists to
        # prevent -- surface it as a failure, never swallow it
        return [f"<DESCRIBE failed: {type(e).__name__}: {str(e)[:120]}>"]
    return [r[0] for r in d if r[1] in ("HUGEINT", "UHUGEINT")]


def fetch(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(cols), [tuple(norm_cell(r[i]) for i in order) for r in rows]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        hc = hugeint_cols(con, oracle[name])
        if hc:
            print(f"FAIL {name}: oracle emits HUGEINT column(s) {hc} "
                  f"(driver serializes as double) -- CAST to BIGINT")
            n_fail += 1
            continue
        try:
            sc, srows = fetch(
                con, f"SELECT * FROM read_parquet({files!r})")
            dc, drows = fetch(con, oracle[name])
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            n_fail += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; "
                  f"first at {i}:\n  cols {sc}\n  spark={a}\n  duck ={b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
