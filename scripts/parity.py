#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/parity.py [sfdir] [outdir]

Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` already ran (or
run with --run to invoke it). For each query parquet in outdir:
  - run the matching oracle SQL from oracle_sql.json in DuckDB with
    views named after the tables,
  - sort columns by name, sort rows, compare cell-by-cell.
Reports exact mismatches and float near-misses separately.
"""
import json, math, subprocess, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in idx))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in idx], out


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sfdir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    outdir = args[1] if len(args) > 1 else "/tmp/verify_out"
    if "--run" in sys.argv:
        subprocess.run(["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}'],
                       check=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            mine = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            mrows, mcols = mine.fetchall(), [d[0] for d in mine.description]
            ref = con.execute(sql)
            rrows, rcols = ref.fetchall(), [d[0] for d in ref.description]
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            bad += 1
            continue
        mc, mr = canon(mrows, mcols)
        rc, rr = canon(rrows, rcols)
        if mc != rc:
            print(f"FAIL {name}: columns {mc} vs {rc}")
            bad += 1
            continue
        if len(mr) != len(rr):
            print(f"FAIL {name}: rowcount {len(mr)} vs {len(rr)}")
            bad += 1
            continue
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(mr, rr)) if a != b]
        if diffs:
            print(f"FAIL {name}: {len(diffs)}/{len(mr)} differing rows; first: "
                  f"{diffs[0][1]} vs {diffs[0][2]} (cols {mc})")
            bad += 1
            continue
        # Type parity: the driver hashes values AFTER a dataframe
        # conversion, where a dtype skew (HUGEINT from an uncast
        # DuckDB integer sum(), DECIMAL, int32-vs-int64) changes the
        # hashed representation even when every value compares equal.
        # r9 shipped three hash-fails with identical values for
        # exactly this reason (uncast sum() -> HUGEINT). Compare
        # DuckDB's view of both schemas and fail on any mismatch.
        mty = {c: t for c, t, *_ in con.execute(
            f"DESCRIBE SELECT * FROM '{outdir}/{name}/*.parquet'").fetchall()}
        rty = {c: t for c, t, *_ in con.execute(
            f"DESCRIBE SELECT * FROM ({sql})").fetchall()}
        skew = [(c, mty.get(c), rty.get(c)) for c in rty
                if mty.get(c) != rty.get(c)]
        if skew:
            print(f"FAIL {name}: dtype skew (spark vs oracle): {skew}")
            bad += 1
        else:
            print(f"ok   {name} ({len(mr)} rows)")
            ok += 1
    print(f"== {ok} ok, {bad} fail ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
