#!/usr/bin/env python3
"""Shuffle-byte regression diff between two BENCH_LOCAL.json snapshots.

Wall-clock comparisons across rounds are box-load noise (proven twice:
identical code swung 174.6 s -> 154.6 s between rounds 8 and 9); shuffle
bytes are deterministic for a given plan + data, so byte growth IS plan
regression. This flags any query whose steady-state shuffle read or
write grew more than --threshold x (default 1.5) between the baseline
snapshot and the current one, ignoring queries below --floor-mb
(default 1.0) on both sides where a ratio is meaningless.

Usage:
  python3 tools/bench_bytes_diff.py                 # HEAD's committed file vs working copy
  python3 tools/bench_bytes_diff.py --rev <rev>     # <rev>'s file vs working copy
  python3 tools/bench_bytes_diff.py old.json new.json

Exit code: 0 = no regressions, 1 = regressions flagged, 2 = usage/data error.
"""
import argparse
import json
import subprocess
import sys


def load_rev(rev, path="BENCH_LOCAL.json"):
    out = subprocess.run(["git", "show", f"{rev}:{path}"],
                         capture_output=True, cwd=sys.path[0] + "/..")
    if out.returncode != 0:
        sys.exit(f"cannot read {path} at {rev}: {out.stderr.decode().strip()}")
    return json.loads(out.stdout)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*", help="old.json new.json (explicit mode)")
    ap.add_argument("--rev", default="HEAD",
                    help="git rev for the baseline snapshot (default HEAD)")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag growth above this ratio (default 1.5)")
    ap.add_argument("--floor-mb", type=float, default=1.0,
                    help="ignore queries under this many MB on both sides")
    a = ap.parse_args()

    if len(a.files) == 2:
        old = json.load(open(a.files[0]))
        new = json.load(open(a.files[1]))
        old_name, new_name = a.files
    elif len(a.files) == 0:
        old = load_rev(a.rev)
        new = json.load(open(sys.path[0] + "/../BENCH_LOCAL.json"))
        old_name, new_name = f"{a.rev}:BENCH_LOCAL.json", "BENCH_LOCAL.json"
    else:
        ap.error("pass zero files (git mode) or exactly two")

    # Shuffle bytes are deterministic for a given plan + data + THREAD
    # COUNT: partitioning (local[N] sets shuffle.partitions=N) changes
    # per-block framing and compression on MB-scale shuffles (measured
    # 1.8x on identical source between 8 and 32 threads). Snapshots from
    # different environments are not comparable — refuse, don't flag.
    oc, nc = old.get("cpus"), new.get("cpus")
    if oc != nc:
        print(f"NOT COMPARABLE: baseline cpus={oc} vs current cpus={nc} "
              f"(shuffle bytes depend on partition count; regenerate the "
              f"baseline at the same SPARK_GRAFT_CPUS)")
        return 2

    flagged = []
    for kind in ("shuffle_read_mb", "shuffle_write_mb"):
        o, n = old.get(kind, {}), new.get(kind, {})
        for q in sorted(set(o) & set(n)):
            ov, nv = float(o[q]), float(n[q])
            # -1 is the bench's "run failed, metric unknown" sentinel —
            # a recovered query must not be flagged against a bogus
            # baseline (and a newly-failed one is already visible as a
            # -1 wall in the queries map).
            if ov < 0 or nv < 0:
                continue
            if max(ov, nv) < a.floor_mb:
                continue
            if nv > ov * a.threshold:
                flagged.append((q, kind, ov, nv, nv / ov if ov else float("inf")))

    # Executor-CPU seconds (recorded since round 14): box-load-immune,
    # unlike wall — a CPU regression is a real plan/expression regression
    # even when shuffle bytes are flat (e.g. a codegen fallback). Floor:
    # 2 CPU-seconds, below which JIT/GC jitter dominates the ratio.
    if "cpu_sec" in old and "cpu_sec" in new:
        o, n = old["cpu_sec"], new["cpu_sec"]
        for q in sorted(set(o) & set(n)):
            ov, nv = float(o[q]), float(n[q])
            if ov < 0 or nv < 0:
                continue
            if max(ov, nv) < 2.0:
                continue
            if nv > ov * a.threshold:
                flagged.append((q, "cpu_sec", ov, nv, nv / ov if ov else float("inf")))

    print(f"baseline {old_name}  vs  {new_name}  "
          f"(threshold {a.threshold}x, floor {a.floor_mb} MB)")
    common = set(old.get("queries", {})) & set(new.get("queries", {}))
    print(f"{len(common)} common queries; "
          f"new-only: {sorted(set(new.get('queries', {})) - set(old.get('queries', {})))}")
    if not flagged:
        print("OK: no shuffle-byte or executor-CPU regressions")
        return 0
    print(f"\n{len(flagged)} REGRESSION(S):")
    for q, kind, ov, nv, r in flagged:
        unit = "sec" if kind == "cpu_sec" else "MB"
        print(f"  {q:28s} {kind:17s} {ov:10.2f} -> {nv:10.2f} {unit}  ({r:.2f}x)")
    return 1


if __name__ == "__main__":
    sys.exit(main())
