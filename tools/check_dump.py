#!/usr/bin/env python3
"""Loud-fail guard for a graft.Verify dump (r9 verdict #1).

CORRECTNESS_r09.json landed empty ({}) because the driver's Verify run
collided with the sbt target lock / ran before the final commits, and the
pipeline wrote an empty map instead of failing. This guard makes an
incomplete dump IMPOSSIBLE to mistake for a green one: run it after any
Verify dump (builder-side or driver-side) and it exits non-zero with a
one-line reason unless the dump is structurally complete.

Usage: check_dump.py <verifyOutDir> [expected_min_results]

Checks, each fatal:
  1. <outDir>/oracle_sql.json exists, parses as JSON, and is a non-empty
     object (every registered oracle must have shipped).
  2. Every oracle key has a result directory containing >= 1 parquet file
     (a query that errored inside Verify leaves no parquet — that must
     surface here, not as a silently-missing row in the compare).
  3. The number of result dirs >= expected_min_results when given
     (pass SparkEntry.queries.size; default: len(oracle_sql), i.e. at
     minimum every oracled query must have dumped — rows-only queries
     like q24 add dirs beyond that floor).

Exit 0 + "DUMP OK" line only when all pass.
"""
import sys, os, json, glob


def die(msg: str) -> None:
    print(f"DUMP INCOMPLETE: {msg}", file=sys.stderr)
    sys.exit(1)


def main() -> None:
    if len(sys.argv) < 2:
        die("usage: check_dump.py <verifyOutDir> [expected_min_results]")
    outdir = sys.argv[1]
    expected_min = int(sys.argv[2]) if len(sys.argv) > 2 else None

    osql = os.path.join(outdir, "oracle_sql.json")
    if not os.path.isfile(osql):
        die(f"{osql} is missing — Verify never reached its JSON dump "
            f"(sbt lock collision or crash before the loop finished)")
    try:
        oracle = json.load(open(osql))
    except Exception as e:  # noqa: BLE001 — any parse failure is fatal
        die(f"{osql} is not valid JSON ({e})")
    if not isinstance(oracle, dict) or not oracle:
        die(f"{osql} parsed to an empty/non-object value — "
            f"an empty oracle map means an empty correctness round")

    result_dirs = {os.path.basename(p)
                   for p in glob.glob(os.path.join(outdir, "*"))
                   if os.path.isdir(p)}
    missing = sorted(k for k in oracle if k not in result_dirs)
    if missing:
        die(f"{len(missing)} oracled queries have no result dir: "
            f"{', '.join(missing[:10])}{' …' if len(missing) > 10 else ''}")
    empty = sorted(
        k for k in oracle
        if not glob.glob(os.path.join(outdir, k, "*.parquet")))
    if empty:
        die(f"{len(empty)} result dirs contain no parquet (query failed "
            f"inside Verify): "
            f"{', '.join(empty[:10])}{' …' if len(empty) > 10 else ''}")

    floor = expected_min if expected_min is not None else len(oracle)
    if len(result_dirs) < floor:
        die(f"only {len(result_dirs)} result dirs, expected >= {floor}")

    print(f"DUMP OK: {len(result_dirs)} results, {len(oracle)} oracles, "
          f"floor {floor}")


if __name__ == "__main__":
    main()
