#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
(run graft.Verify first to populate <outDir>).

For each <name>.parquet in outDir with an entry in oracle_sql.json:
register every table of sfDir as a DuckDB view, run the oracle SQL,
compare against the Spark result EXACTLY (columns sorted by name, rows
sorted, values repr'd with no rounding).

Round-1 lesson: the real driver stringifies DECIMAL values read from
Spark parquet differently from the same values fetched out of DuckDB
(scale-preserving Decimal string vs float repr) — every round-1 hash
mismatch, and only those, had such a column. DATE/TIMESTAMP only ever
co-occurred with the failures, so they're treated as unsafe too. This
checker therefore REJECTS any Spark output column whose arrow type is
decimal/date/timestamp (TYPE_UNSAFE), independent of value equality:
the verify surface must only expose string/bool/int/double.
"""
import json, os, sys, glob
import duckdb
import pyarrow.parquet as pq

UNSAFE = ("decimal", "date", "timestamp")

# Round-9 lesson (the symmetric gap): the spark-vs-oracle type compare
# below goes through the DB-API cursor description, which collapses
# BIGINT and HUGEINT into one generic numeric code — so an oracle whose
# output column is a bare sum(BIGINT) (HUGEINT in DuckDB) passed here
# while the real driver, which canonicalizes the oracle result through
# a dataframe where HUGEINT becomes float64, stringified `477.0` vs
# Spark's `477`. Local green must imply driver green, so the oracle's
# REAL DuckDB types (via DESCRIBE) are gated on this allowlist: any
# other type (HUGEINT, DECIMAL, DATE, TIMESTAMP, UBIGINT, ...) is
# rejected as ORACLE_TYPE_UNSAFE even when the values compare equal.
ORACLE_SAFE_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT",
                     "DOUBLE", "FLOAT", "BOOLEAN", "VARCHAR"}

def oracle_unsafe_types(con, sql):
    """Column/type pairs of the oracle result not on the allowlist."""
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    return [f"{r[0]}:{r[1]}" for r in desc
            if r[1] not in ORACLE_SAFE_TYPES]

def canon(rows, cols):
    # sort columns by name, stringify exactly, sort rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    # An interrupted Verify (killed JVM) leaves a TRUNCATED outDir that
    # used to read as a smaller all-green set — the round-8 failure mode
    # at tool level. Every oracle key without a result dir is a failure.
    for name in sorted(oracle):
        if not os.path.isdir(os.path.join(out_dir, name)):
            results[name] = "MISSING (oracle has no result dir — " \
                "Verify failed or was interrupted)"
    # Verify-recorded in-JVM failures are red rows with the REAL reason —
    # a gate that threw mid-write leaves a partial dir, so these must win
    # over whatever the dir loop below would conclude from the remnants
    errs = {}
    errs_path = os.path.join(out_dir, "errors.json")
    if os.path.exists(errs_path):
        errs = json.load(open(errs_path))
    for name, msg in errs.items():  # covers dir-less failures too
        results[name] = f"VERIFY_ERROR {msg}"
    for name in sorted(os.listdir(out_dir)):
        if name in errs:
            continue
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        parts = glob.glob(os.path.join(d, "*.parquet"))
        if not parts:
            results[name] = "NO_OUTPUT (no parquet part files in result dir)"
            continue
        # driver-unsafe output types, including nested occurrences inside
        # struct/array/map (see module docstring)
        aschema = pq.read_schema(parts[0])
        unsafe = [f"{f.name}:{f.type}" for f in aschema
                  if any(k in str(f.type) for k in UNSAFE)]
        got = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')")
        gcols = [c[0] for c in got.description]
        gt = {c[0]: str(c[1]) for c in got.description}
        grows = got.fetchall()
        if name not in oracle:
            results[name] = (f"TYPE_UNSAFE {unsafe}" if unsafe
                             else f"ROWS_ONLY rows={len(grows)}")
            continue
        try:
            oracle_unsafe = oracle_unsafe_types(con, oracle[name])
            exp = con.execute(oracle[name])
            ecols = [c[0] for c in exp.description]
            et = {c[0]: str(c[1]) for c in exp.description}
            erows = exp.fetchall()
        except Exception as e:
            results[name] = f"ORACLE_ERROR {e}"
            continue
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        # strict type audit: column-by-column duckdb-visible types
        badtypes = [f"{c}: spark={gt[c]} oracle={et[c]}"
                    for c in gt if c in et and gt[c] != et[c]]
        if unsafe:
            results[name] = f"TYPE_UNSAFE {unsafe}"
        elif oracle_unsafe:
            results[name] = f"ORACLE_TYPE_UNSAFE {oracle_unsafe}"
        elif gc != ec:
            results[name] = f"SCHEMA_MISMATCH spark={gc} oracle={ec}"
        elif badtypes:
            results[name] = f"TYPE_MISMATCH {badtypes}"
        elif gr != er:
            diff = [(a, b) for a, b in zip(gr, er) if a != b][:3]
            extra = f" first_diffs={diff}" if diff else \
                f" row_counts spark={len(gr)} oracle={len(er)}"
            results[name] = f"VALUE_MISMATCH{extra}"
        else:
            results[name] = f"OK rows={len(gr)}"
    bad = 0
    for k, v in sorted(results.items()):
        flag = "  " if v.startswith(("OK", "ROWS_ONLY")) else "!!"
        if flag == "!!":
            bad += 1
        print(f"{flag} {k}: {v[:400]}")
    print(f"\n{len(results)-bad}/{len(results)} pass")
    return 1 if bad else 0

def selftest():
    """Regression pin for the round-9 defect class: a bare sum(BIGINT)
    oracle output (HUGEINT) must be rejected HERE, before the driver
    ever sees it; the CAST(... AS BIGINT) form must pass."""
    con = duckdb.connect()
    bare = "SELECT sum(x) AS s FROM (SELECT CAST(477 AS BIGINT) AS x)"
    cast = ("SELECT CAST(sum(x) AS BIGINT) AS s "
            "FROM (SELECT CAST(477 AS BIGINT) AS x)")
    bad = oracle_unsafe_types(con, bare)
    assert bad == ["s:HUGEINT"], f"bare sum(BIGINT) not flagged: {bad}"
    ok = oracle_unsafe_types(con, cast)
    assert ok == [], f"cast sum flagged: {ok}"
    for sql, t in [("SELECT CAST(1.5 AS DECIMAL(4,2)) AS c", "DECIMAL(4,2)"),
                   ("SELECT DATE '2026-01-01' AS c", "DATE"),
                   ("SELECT TIMESTAMP '2026-01-01' AS c", "TIMESTAMP")]:
        got = oracle_unsafe_types(con, sql)
        assert got == [f"c:{t}"], f"{t} not flagged: {got}"
    print("selftest OK")
    return 0

if __name__ == "__main__":
    if sys.argv[1:] == ["--selftest"]:
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
