"""Diff two SMOKE_SF.json artifacts (the per-round sf0.1 execution gate).

Surfaces exactly what the per-round smoke gate exists to catch:
status flips (ok -> timeout/err and back), keys added/removed, and
large wall-time ratio moves on the same key. Raw seconds carry the
documented shared-box drift band (up to 3x per key run-to-run on
identical code — SCALE.md 9w), so the default ratio threshold is 4x:
anything past it is worth a plan diff, anything under it is weather.

Usage:
    python tools/smoke_diff.py OLD.json NEW.json [ratio_threshold]
Exit 1 on status regressions (ok -> timeout/err or missing key);
ratio moves and improvements are report lines only.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))["keys"]
    new = json.load(open(sys.argv[2]))["keys"]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 4.0

    regressions = 0
    for k in sorted(old):
        if k not in new:
            print(f"REMOVED {k} (was {old[k]['status']})")
            regressions += 1
    for k in sorted(new):
        if k not in old:
            print(f"added   {k} ({new[k]['status']}, {new[k]['sec']}s)")
    for k in sorted(set(old) & set(new)):
        o, n = old[k], new[k]
        if o["status"] != n["status"]:
            line = f"STATUS  {k}: {o['status']} -> {n['status']}"
            if o["status"] == "ok":
                regressions += 1
                print(line)
            else:
                print(line + " (improvement)")
            continue
        if o["status"] == "ok" and o["sec"] > 0 and n["sec"] / max(o["sec"], 0.1) >= thresh:
            print(f"SLOWER  {k}: {o['sec']}s -> {n['sec']}s (>= {thresh}x — plan-diff it)")
        if o.get("rows") is not None and o.get("rows") != n.get("rows"):
            print(f"ROWS    {k}: {o['rows']} -> {n['rows']}")
            regressions += 1

    print(f"\n== {regressions} regression(s); ratio threshold {thresh}x")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
