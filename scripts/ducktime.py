#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB and emit one JSON line of
per-query seconds — the raw material benchmerge/baseline fold into
BASELINE.md's DuckDB column. Unlike baseline.py this does NOT write
BASELINE.md; it exists so bench-recording windows can capture the
numerator (graft.Bench) and denominator (this) in the SAME load
window and merge minima across many windows.

Usage: python3 scripts/ducktime.py <sfdir> <oracle_sql.json> [out.json]
"""
import json, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir, oracle_path = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else None
    oracles = json.load(open(oracle_path))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    times, errs = {}, {}
    # one calibration probe bracketing the pass (fixed CPU work)
    def probe():
        t0 = time.time()
        con.execute("SELECT sum(hash(i)%100000) FROM range(0,100000000) t(i)").fetchall()
        return round(time.time() - t0, 4)
    p0 = probe()
    for name in sorted(oracles):
        t0 = time.time()
        try:
            con.execute(oracles[name]).fetchall()
            times[name] = round(time.time() - t0, 4)
        except Exception as e:
            errs[name] = str(e)[:120]
    p1 = probe()
    line = json.dumps({"queries": times, "errors": errs,
                       "probes": [p0, p1], "sf": sfdir})
    print(line)
    if out:
        open(out, "w").write(line + "\n")


if __name__ == "__main__":
    main()
