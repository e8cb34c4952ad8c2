#!/usr/bin/env python3
"""Produce BASELINE.md: single-node reference timings for every
oracle-expressible query, so the "BENCH within 2x of BASELINE" gate is
computable.

Baseline engine: DuckDB (the same engine the correctness gate trusts),
executing each query's oracle SQL against the sf0.1 parquet with all
cores. Rationale: the reference implementation (scida) is a
Python/dask library whose runtime deps (dask, h5py) are not installed
in this container, so its own numbers cannot be measured here; DuckDB
on identical data and identical semantics is the strongest available
single-node stand-in, and is if anything a HARD baseline (vectorized
C++ OLAP vs JVM Spark on one machine).

Usage: python3 scripts/baseline.py [sfdir] [oracle_sql.json] [bench.json]
Writes BASELINE.md in the repo root.
"""
import json, os, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
    bench_path = sys.argv[3] if len(sys.argv) > 3 else None
    oracles = json.load(open(oracle_path))

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

    # BASELINE_PASSES whole-suite passes (default 2), each query timed
    # once per pass, per-query MIN kept across passes — whole-suite
    # interleaving (not per-query repeats) so an ambient load burst
    # cannot inflate one query's every attempt.
    passes = int(os.environ.get("BASELINE_PASSES", "2"))
    times = {}
    for _ in range(max(2, passes)):
        for name in sorted(oracles):
            t0 = time.perf_counter()
            con.execute(oracles[name]).fetchall()
            dt = time.perf_counter() - t0
            times[name] = min(times.get(name, dt), dt)
    # BASELINE_PRIOR=<previous BASELINE.md>: fold the prior record's
    # per-query baseline minima in. FAIRNESS, not convenience: the
    # graft column may carry minima from an earlier (quieter) window,
    # and comparing those against a single louder DuckDB window would
    # flatter graft — both columns get the same
    # min-over-all-recorded-passes treatment.
    prior = os.environ.get("BASELINE_PRIOR")
    if prior and os.path.isfile(prior):
        import re
        folded = 0
        for line in open(prior):
            m = re.match(r"\| (\S+)(?: †)? \| ([0-9.]+) \| ", line)
            if m and m.group(1) in times:
                prev = float(m.group(2))
                if prev < times[m.group(1)]:
                    times[m.group(1)] = prev
                    folded += 1
        print(f"folded {folded} prior per-query minima from {prior}")

    bench = None
    if bench_path:
        # Bench emits TWO JSON lines (full map + compact summary);
        # parse the line carrying the per-query map
        bench = None
        for line in open(bench_path):
            if '"queries"' in line and "{" in line:
                bench = json.loads(line[line.index("{"):])
                break
        if bench is None:
            raise SystemExit(f"no queries JSON line in {bench_path}")

    # Gate-oracled queries: the oracle verifies a verdict or replays
    # only part of the computation (constant recall verdicts for ANN,
    # exact-side-only bound checks for the sketches, banding-only
    # replay from persisted signatures for dedup_simhash), so
    # graft-vs-oracle is not an equivalent-work comparison — their
    # rows show "(gate)" and are excluded from the aggregate ratio.
    verdict_only = {"ann_ivf", "ann_ivfpq", "ann_lsh", "ann_pq",
                    "ann_batch_ivf",
                    "sketch_distinct", "sketch_freq", "sketch_percentiles",
                    "sketch_union", "dedup_simhash"}

    total = sum(times.values())
    lines = [
        "# BASELINE — single-node reference timings (DuckDB oracle engine)",
        "",
        f"- Data: `{sfdir}` (driver-generated parquet, one row group per file)",
        f"- Engine: DuckDB {duckdb.__version__}, all cores, each oracle SQL",
        f"  timed once per whole-suite pass, MIN kept across",
        f"  {max(2, int(os.environ.get('BASELINE_PASSES', '2')))} interleaved passes"
        " (mirrors `graft.Bench`'s best-of-n).",
        "- Why DuckDB: the reference (scida) is a Python/dask library whose",
        "  runtime deps (dask, h5py) are absent in this container, so its own",
        "  numbers are unmeasurable here. DuckDB executes the SAME semantics",
        "  on the SAME files and is a hard single-node baseline (vectorized",
        "  C++ OLAP). Queries with no oracle SQL (sketches, LSH/IVF ANN,",
        "  SimHash, streaming, multimodal stubs) have no baseline row.",
        "- Ingestion queries (hdf5_load, cosmo_physical, zarr_roundtrip) are",
        "  baselined on the ORIGINAL parquet (their oracles' form); the graft",
        "  side additionally pays the chunked write+read of the fixture.",
        "- Synthesize-and-predict queries (multimodal_decode/_audio,",
        "  dedup_phash, dedup_audiofp,",
        "  pii_redact, url_normalize, sample_mix) have oracles that PREDICT",
        "  the operator's output arithmetically instead of performing the",
        "  work (codec round-trip, regex scrub, md5 sampling), so their",
        "  ratios compare real work against a constant-folding stand-in and",
        "  overstate the gap by design.",
        "- Layout asymmetry, the other direction: the narrow lineitem",
        "  queries (load_project, derived_field, filter_select,",
        "  unit_convert, unit_algebra) scan a key-clustered at-rest copy",
        "  written once per dataset (the production ingest layout; same",
        "  pattern as boxcut's Z-ordered copy) and pay only a local sort,",
        "  while the DuckDB column still runs a full ORDER BY over the",
        "  original unsorted parquet each time. Their sub-1.0 ratios show",
        "  the layout lever, not raw engine speed.",
    ] + ([
        "- Load calibration: the graft column's pass measured Bench's",
        f"  fixed CPU probe at probe_sec={bench.get('probe_sec'):.3f}",
        f"  ({bench.get('cpus')} threads, best-of-{bench.get('runs', 2)}"
        " per query across",
        "  the recording window's passes — when ambient neighbor load",
        "  keeps any single pass's probes above the 1.3x-clean bar, the",
        "  recorded column is the per-query MIN over several full passes",
        "  (each query's best attempt lands in SOME quiet segment; the",
        "  same minima treatment the DuckDB column gets). Probes from",
        "  all merged passes ride in the `probes` array. Probes are",
        "  INTERLEAVED every probe_seg queries (JSON `probes` array;",
        "  probes[i] precedes segment i, plus one final probe).",
        "  Per-segment rule: a query in segment i is load-contaminated",
        "  when max(probes[i], probes[i+1]) > 1.5x this recorded",
        "  probe_sec — judge those rows against a re-run, not this",
        "  table. (The r4/r5 driver passes were load-contaminated;",
        "  r5's burst hit MID-pass, which before/after-only probes",
        "  missed — hence the interleaving.)",
    ] if bench and bench.get("probe_sec") is not None else []) + [
        "",
        f"**Baseline total ({len(times)} queries): {total:.2f} s**",
        "",
        "| query | baseline s | graft s | ratio (graft/base) |",
        "| --- | ---: | ---: | ---: |",
    ]
    # self-diagnosis: queries in a segment whose bracketing probes
    # exceed 1.5x the pass's own best probe ran under machine load
    suspect = set()
    if bench and bench.get("probes"):
        pr = bench["probes"]
        seg = bench.get("probe_seg", 15)
        ref = min(pr)
        for j, nm in enumerate(sorted(bench.get("queries", {}))):
            i = min(j // seg, len(pr) - 2)
            if max(pr[i], pr[i + 1]) > 1.5 * ref:
                suspect.add(nm)
    if suspect:
        lines.append(f"| _† = segment probe >1.5x best "
                     f"(load-contaminated rows: {len(suspect)})_ | | | |")
    ratios = []
    for name in sorted(times):
        b = times[name]
        mark = " †" if name in suspect else ""
        if bench and name in bench.get("queries", {}):
            g = bench["queries"][name]
            if name in verdict_only:
                lines.append(f"| {name}{mark} | (gate) | {g:.3f} | — |")
                continue
            r = g / b if b > 0 else float("inf")
            ratios.append(r)
            lines.append(f"| {name}{mark} | {b:.3f} | {g:.3f} | {r:.1f} |")
        else:
            lines.append(f"| {name} | {b:.3f} | — | — |")
    if bench and ratios:
        # one key set for BOTH sums: oracled, non-verdict, AND present
        # in the bench pass — a query missing from either side must
        # drop out of numerator and denominator together
        common = [k for k in times
                  if k in bench.get("queries", {}) and k not in verdict_only]
        gtot = sum(bench["queries"][k] for k in common)
        btot = sum(times[k] for k in common)
        # Structurally ASYMMETRIC oracles flatter graft's aggregate:
        # graph/FoF algorithms can only be spelled as recursive CTEs
        # in SQL (DuckDB re-joins the frontier each level), and
        # dedup_substring_maximal's oracle is an inherently
        # inefficient SQL spelling of suffix-chain alignment
        # (39-410 s at sf0.1 where graft pays ~1 s). Exclude them for
        # the conservative number — reported under BOTH definitions so
        # round-over-round headlines stay comparable: the pre-r12 set
        # (5 recursive-CTE rows) and the current set (+ substring).
        recursive_cte_rows = {"halo_massfunc", "fof_groups", "dedup_clusters",
                              "dedup_clusters_incremental", "bfs_step"}
        asymmetric_oracles = recursive_cte_rows | {"dedup_substring_maximal"}
        nr_old = [k for k in common if k not in recursive_cte_rows]
        nr = [k for k in common if k not in asymmetric_oracles]
        gnr_old = sum(bench["queries"][k] for k in nr_old)
        bnr_old = sum(times[k] for k in nr_old)
        gnr = sum(bench["queries"][k] for k in nr)
        bnr = sum(times[k] for k in nr)
        lines += [
            "",
            f"**graft total on the same {len(common)} queries: {gtot:.2f} s "
            f"(baseline {btot:.2f} s) → aggregate ratio {gtot / btot:.2f}x**",
            "",
            f"Excluding the {len(common) - len(nr)} structurally-asymmetric"
            f" oracle rows ({', '.join(sorted(asymmetric_oracles & set(common)))}"
            " — recursive-CTE graph replays plus substring_maximal's"
            " quadratic suffix-chain SQL, all inherently inefficient"
            " spellings that flatter graft):"
            f" **{len(nr)} queries, graft {gnr:.2f} s vs baseline"
            f" {bnr:.2f} s → {gnr / bnr:.2f}x**",
            "",
            f"Same aggregate under the pre-r12 definition (recursive-CTE"
            f" rows only excluded, {len(nr_old)} queries — kept so"
            " round-over-round headlines stay comparable):"
            f" **graft {gnr_old:.2f} s vs baseline {bnr_old:.2f} s →"
            f" {gnr_old / bnr_old:.2f}x**",
            "",
            "Note: per-query ratios on this dataset carry a fixed overhead",
            "floor — Spark job scheduling + codegen is O(100 ms) per query",
            "while DuckDB on sub-GB data often finishes in O(10 ms), so",
            "cheap queries show inflated ratios that vanish at real scale;",
            "the aggregate ratio and the expensive-query rows (dedup family,",
            "joins, windows) are the meaningful comparison.",
        ]
    open("BASELINE.md", "w").write("\n".join(lines) + "\n")
    print(f"BASELINE.md written: {len(times)} queries, total {total:.2f}s")


if __name__ == "__main__":
    main()
