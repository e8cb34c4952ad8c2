#!/usr/bin/env python3
"""Merge multiple graft.Bench JSON lines into one minima record.

Usage: python3 scripts/benchmerge.py out.json pass1.json [pass2.json ...]
       [--prior BASELINE.md]

Per-query MIN across all passes (the protocol BASELINE.md documents:
when ambient neighbor load keeps any single pass's probes above the
1.3x-clean bar, the recorded column is each query's best attempt —
the same minima treatment the DuckDB column gets from baseline.py's
interleaved passes). Probe arrays are CONCATENATED so the per-segment
contamination rule stays evaluable against every merged pass;
probe_sec is the min.

--prior folds the graft column of a previous BASELINE.md in.
IMPORTANT: a prior minimum recorded against an implementation that
has since CHANGED would mask a regression forever (min() keeps the
dead code's time) — list such queries in --exclude q1,q2 so their
rows carry only fresh measurements.

--since <rev> derives that exclude set MECHANICALLY from the git
diff: every hunk touching src/main/scala/graft/queries/*.scala is
attributed to its enclosing `"name" -> QueryDef` anchor and those
queries are auto-added to the exclude set (no author memory in the
loop). Hunks above the first anchor (shared per-file helpers) and
changed non-queries source files (operators, expressions, dedup/ann
internals) can affect queries this attribution can't see — they are
printed as loud warnings so the author widens --exclude by hand.
"""
import json, os, re, subprocess, sys


def load_pass(path):
    for line in open(path):
        line = line.strip()
        if line.startswith("[info] "):
            line = line[len("[info] "):]
        if '"queries"' in line and line.startswith("{"):
            return json.loads(line)
    raise SystemExit(f"no bench queries line in {path}")


ANCHOR = re.compile(r'"([a-z0-9_]+)"\s*->\s*QueryDef')
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def queries_changed_since(rev):
    """Attribute every diff hunk in queries/*.scala to its enclosing
    `"name" -> QueryDef` anchor; return (changed_queries, warnings)."""
    files = subprocess.run(
        ["git", "diff", "--name-only", rev, "--",
         "src/main/scala/graft"],
        cwd=REPO, capture_output=True, text=True, check=True
    ).stdout.split()
    changed, warns = set(), []
    for f in files:
        if "/queries/" not in f or not f.endswith(".scala"):
            warns.append(f"non-queries source changed: {f} — queries "
                         "built on it are NOT auto-excluded")
            continue
        path = os.path.join(REPO, f)
        if not os.path.exists(path):
            warns.append(f"deleted file in diff: {f}")
            continue
        anchors = []  # (line_no, query_name), ascending
        for i, line in enumerate(open(path), start=1):
            m = ANCHOR.search(line)
            if m:
                anchors.append((i, m.group(1)))
        diff = subprocess.run(
            ["git", "diff", "-U0", rev, "--", f],
            cwd=REPO, capture_output=True, text=True, check=True).stdout
        for m in re.finditer(r"^@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@",
                             diff, re.M):
            start = int(m.group(1))
            n = int(m.group(2)) if m.group(2) is not None else 1
            end = start + max(n, 1) - 1
            # a hunk belongs to the last anchor at or above its start;
            # it can also spill into later anchors it overlaps
            hit = [name for (ln, name) in anchors if ln <= end]
            owner = hit[-1] if hit else None
            spill = [name for (ln, name) in anchors if start <= ln <= end]
            if owner is None:
                warns.append(f"{f}: hunk at +{start} precedes the first "
                             "query anchor (file-level helpers) — ALL of "
                             "this file's queries may be affected")
            else:
                changed.add(owner)
                changed.update(spill)
    return changed, warns


def main():
    args = sys.argv[1:]
    prior = None
    exclude = set()
    if "--prior" in args:
        i = args.index("--prior")
        prior = args[i + 1]
        del args[i:i + 2]
    if "--exclude" in args:
        i = args.index("--exclude")
        exclude = set(args[i + 1].split(","))
        del args[i:i + 2]
    if "--since" in args:
        i = args.index("--since")
        derived, warns = queries_changed_since(args[i + 1])
        del args[i:i + 2]
        for w in warns:
            print(f"  WARN --since: {w}")
        extra = derived - exclude
        if extra:
            print(f"  --since derived {len(extra)} changed queries not in "
                  f"--exclude (auto-added): {','.join(sorted(extra))}")
        exclude |= derived
    out, paths = args[0], args[1:]
    merged = None
    for p in paths:
        d = load_pass(p)
        d.setdefault("probes", [])
        if merged is None:
            merged = d
            merged["passes"] = 1
        else:
            for k, v in d["queries"].items():
                if k in merged["queries"]:
                    merged["queries"][k] = min(merged["queries"][k], v)
                else:
                    merged["queries"][k] = v
            merged["probes"] += d["probes"]
            merged["probe_sec"] = min(merged.get("probe_sec", 9e9),
                                      d.get("probe_sec", 9e9))
            merged["runs"] = max(merged.get("runs", 2), d.get("runs", 2))
            merged["passes"] += 1
    folded = 0
    suspicious = []
    if prior:
        for line in open(prior):
            m = re.match(r"\| (\S+?)(?: †)? \| (?:[0-9.]+|\(gate\)) "
                         r"\| ([0-9.]+) \|", line)
            if m and m.group(1) in merged["queries"] \
                    and m.group(1) not in exclude:
                prev = float(m.group(2))
                fresh = merged["queries"][m.group(1)]
                if prev < fresh:
                    # a prior minimum displacing a MUCH slower fresh
                    # measurement is either ambient load or a stale
                    # minimum from a since-rewritten implementation
                    # missing from --exclude — surface it either way
                    if fresh > 1.3 * prev and fresh >= 0.2:
                        suspicious.append(
                            (m.group(1), prev, fresh, fresh / prev))
                    merged["queries"][m.group(1)] = prev
                    folded += 1
    merged["value"] = round(sum(merged["queries"].values()), 4)
    json.dump(merged, open(out, "w"))
    pr = merged["probes"]
    prange = f"{max(pr)/min(pr):.2f}" if pr and min(pr) > 0 else "n/a"
    print(f"merged {len(paths)} passes ({merged['passes']} total), "
          f"folded {folded} prior minima "
          f"({len(exclude)} excluded as changed), "
          f"total {merged['value']:.2f} s over {len(merged['queries'])} queries, "
          f"probe_sec {merged.get('probe_sec', float('nan')):.4f}, "
          f"probes n={len(pr)} max/min {prange}")
    for name, prev, fresh, ratio in sorted(suspicious, key=lambda t: -t[3]):
        print(f"  WARN prior minimum kept for {name}: prior {prev:.3f} s vs "
              f"fresh {fresh:.3f} s ({ratio:.2f}x) — confirm the "
              f"implementation is unchanged (else add to --exclude)")


if __name__ == "__main__":
    main()
