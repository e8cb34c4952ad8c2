#!/usr/bin/env python3
"""Key-set diff for CORRECTNESS_r{N}.json files.

The driver OMITS any query whose Verify build THROWS — a round can
silently lose queries while every surviving row reads green (this hid
the six event queries in round 6). This tool makes the gap visible:

    python3 scripts/keycheck.py CORRECTNESS_r07.json CORRECTNESS_r08.json
    python3 scripts/keycheck.py CORRECTNESS_r08.json --verify-dump /tmp/verify_out

With --verify-dump, the second key set is the query dump directories a
local `graft.Verify` run produced (the full current query set), so
missing keys mean the DRIVER's run lost them.
"""
import json, os, sys


def keys_of(path):
    return set(json.load(open(path)).keys())


def main():
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    a = keys_of(args[0])
    if len(args) >= 2 and args[1] == "--verify-dump":
        # --verify-dump with its dir operand missing must not fall
        # through to the two-file branch (keys_of('--verify-dump')
        # would die with an unhelpful FileNotFoundError)
        if len(args) < 3:
            print(__doc__)
            return 2
        b = {d for d in os.listdir(args[2])
             if os.path.isdir(os.path.join(args[2], d))}
        a_name, b_name = args[0], args[2]
    elif len(args) >= 2:
        b = keys_of(args[1])
        a_name, b_name = args[0], args[1]
    else:
        print(__doc__)
        return 2
    gone = sorted(a - b)
    new = sorted(b - a)
    print(f"{a_name}: {len(a)} keys; {b_name}: {len(b)} keys")
    if gone:
        print(f"LOST ({len(gone)}): {', '.join(gone)}")
    if new:
        print(f"new ({len(new)}): {', '.join(new)}")
    if not gone and not new:
        print("key sets identical")
    return 1 if gone else 0


if __name__ == "__main__":
    sys.exit(main())
