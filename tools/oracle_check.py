#!/usr/bin/env python3
"""Local pre-check that mimics the driver's DuckDB oracle compare.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Registers each <sfDir>/*.parquet as a view named after the table, runs each
SQL in <verifyOutDir>/oracle_sql.json, and compares against the parquet the
Spark side dumped at <verifyOutDir>/<name>/. Columns are sorted by name (the
driver does the same before hashing), rows are sorted for comparison, values
are compared exactly (strings/ints) with float equality required bit-for-bit.
"""
import sys, os, json, glob, math
import duckdb

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)

def frame(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    data = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return cols_sorted, data

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in sorted(glob.glob(f"{sfdir}/*.parquet")):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    all_results = sorted(
        os.path.basename(p) for p in glob.glob(f"{outdir}/*") if os.path.isdir(p))
    for name in all_results:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: spark produced no parquet")
            n_fail += 1
            continue
        gcols, gdata = frame(con, f"SELECT * FROM read_parquet({files!r})")
        # the driver's compare (pandas sort_values + hash) chokes on
        # non-scalar cells ("unhashable type: numpy.ndarray") — exactly how
        # r03's q100/q107 failed. Flag any list/struct/map result column
        # even though our stringified compare survives them.
        grel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        nested = [c for c, t in zip(grel.columns, grel.types)
                  if any(k in str(t) for k in ("[]", "STRUCT", "MAP"))]
        if nested:
            print(f"FAIL {name}: spark result columns {nested} are nested "
                  f"(driver pandas compare can't sort/hash them) — "
                  f"serialize to string")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(gdata)})")
            continue
        try:
            ecols, edata = frame(con, oracle[name])
            # the driver's compare renders DuckDB HUGEINT (integer SUM)
            # differently than BIGINT — this is exactly how r02's three
            # hash mismatches happened. Flag it even though our own
            # stringified compare can't see the difference.
            rel = con.sql(oracle[name])
            hugey = [c for c, t in zip(rel.columns, rel.types)
                     if str(t) == "HUGEINT"]
            if hugey:
                print(f"FAIL {name}: oracle columns {hugey} are HUGEINT "
                      f"(driver renders != BIGINT) — CAST(... AS BIGINT)")
                n_fail += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if gcols != ecols:
            print(f"FAIL {name}: columns spark={gcols} oracle={ecols}")
            n_fail += 1
            continue
        if gdata != edata:
            n_fail += 1
            print(f"FAIL {name}: {len(gdata)} vs {len(edata)} rows", )
            diff_shown = 0
            eset, gset = set(edata), set(gdata)
            for r in gdata:
                if r not in eset and diff_shown < 3:
                    print(f"   spark-only: {r}")
                    diff_shown += 1
            diff_shown = 0
            for r in edata:
                if r not in gset and diff_shown < 3:
                    print(f"   oracle-only: {r}")
                    diff_shown += 1
            if gset == eset:
                # rows are compared sorted, so reaching here with equal sets
                # means duplicate-row multiplicity differs, not ordering
                print("   (same sets — duplicate multiplicity differs)")
            continue
        n_pass += 1
        print(f"PASS {name} ({len(gdata)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(all_results) - n_pass - n_fail} skipped(no-oracle)")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
