#!/usr/bin/env python3
"""Tri-scale exactness verification as a committed artifact.

Usage: python3 tools/triscale.py <round> [sf_dir ...]

Runs graft.Verify at each scale factor (default sf0.001/0.01/0.1), runs
the DuckDB oracle compare (tools/check.py) against each dump, and writes
bench/TRISCALE_r{NN}.json — so the per-round "hash-exact at all three
fixture scales" claim is a diffable committed file, not prose. Exit 1 if
any scale has a failure.
"""
import json
import re
import subprocess
import sys

DEFAULT_SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    rnd = int(sys.argv[1])
    sfs = sys.argv[2:] or DEFAULT_SFS
    out = {"round": rnd, "scales": {}}
    ok = True
    for sf in sfs:
        name = sf.rstrip("/").split("/")[-1]
        dump = f"/root/repo/tmp/triscale_{name}"
        r1 = subprocess.run(
            ["sbt", "-batch", f"runMain graft.Verify {sf} {dump}"],
            cwd="/root/repo", capture_output=True, text=True)
        if r1.returncode != 0:
            out["scales"][name] = {"error": "Verify failed", "rc": r1.returncode}
            ok = False
            continue
        r2 = subprocess.run(
            ["python3", "tools/check.py", sf, dump],
            cwd="/root/repo", capture_output=True, text=True)
        tail = r2.stdout.strip().splitlines()[-1] if r2.stdout.strip() else ""
        m = re.match(r"(\d+) pass, (\d+) fail, (\d+) rows-only", tail)
        rec = {"pass": int(m.group(1)), "fail": int(m.group(2)),
               "rows_only": int(m.group(3))} if m else {"error": tail}
        rec["rc"] = r2.returncode
        out["scales"][name] = rec
        if r2.returncode != 0 or not m or int(m.group(2)) > 0:
            ok = False
        print(f"{name}: {tail}")
    path = f"/root/repo/bench/TRISCALE_r{rnd:02d}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {'ALL GREEN' if ok else 'FAILURES'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
