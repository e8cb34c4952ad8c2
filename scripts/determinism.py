#!/usr/bin/env python3
"""Cross-parallelism determinism proof: sorted-row diff of two Verify
dumps (different local[N] / shuffle-partition settings).

Usage: python3 scripts/determinism.py dirA dirB

For every query dir present in both dumps, DuckDB EXCEPT ALL in both
directions — any row difference (including multiplicity) fails. This
is the r9 protocol re-executable in one step.
"""
import os, sys
import duckdb


def main():
    a, b = sys.argv[1], sys.argv[2]
    qa = {d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d))}
    qb = {d for d in os.listdir(b) if os.path.isdir(os.path.join(b, d))}
    both = sorted(qa & qb)
    asym = sorted(qa ^ qb)
    if asym:
        # a query missing from one side IS a determinism failure (one
        # run crashed or didn't write) — it must not silently drop out
        print(f"FAIL asymmetric dumps — present in only one side: {asym}")
    con = duckdb.connect()
    bad = 0
    for q in both:
        pa, pb = f"{a}/{q}/*.parquet", f"{b}/{q}/*.parquet"
        try:
            d1 = con.execute(
                f"SELECT count(*) FROM (SELECT * FROM '{pa}' EXCEPT ALL "
                f"SELECT * FROM '{pb}')").fetchone()[0]
            d2 = con.execute(
                f"SELECT count(*) FROM (SELECT * FROM '{pb}' EXCEPT ALL "
                f"SELECT * FROM '{pa}')").fetchone()[0]
        except Exception as e:
            print(f"FAIL {q}: {e}")
            bad += 1
            continue
        if d1 or d2:
            print(f"FAIL {q}: {d1}/{d2} rows differ")
            bad += 1
        else:
            print(f"ok   {q}")
    print(f"== {len(both) - bad} identical, {bad} differ, "
          f"{len(asym)} asymmetric ==")
    sys.exit(1 if bad or asym else 0)


if __name__ == "__main__":
    main()
