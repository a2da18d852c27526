#!/usr/bin/env python
"""Compare two bench_detail.json files and flag per-query regressions.

Usage:
    python tools/bench_compare.py OLD.json [NEW.json] [--threshold 1.3]

NEW defaults to the repo's current bench_detail.json. Exit code 1 when
any query slowed by more than the threshold AND by more than 0.3s
absolute (local-mode timings under ~0.5s are scheduler noise).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new", nargs="?", default="bench_detail.json")
    ap.add_argument("--threshold", type=float, default=1.3)
    args = ap.parse_args()

    with open(args.old) as fh:
        old = json.load(fh)
    with open(args.new) as fh:
        new = json.load(fh)
    oq, nq = old["queries"], new["queries"]

    print(f"total: {old['value']}s ({len(oq)} queries) -> "
          f"{new['value']}s ({len(nq)} queries)")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"added ({len(added)}): " + ", ".join(
            f"{n} {nq[n]}s" for n in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))

    regressions = []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if b > a * args.threshold and b - a > 0.3:
            regressions.append((name, a, b))
    improvements = [
        (name, oq[name], nq[name])
        for name in sorted(set(oq) & set(nq))
        if nq[name] * args.threshold < oq[name] and oq[name] - nq[name] > 0.3
    ]
    for name, a, b in sorted(regressions, key=lambda r: r[1] - r[2]):
        print(f"REGRESSION {name}: {a}s -> {b}s ({b / a:.2f}x)")
    for name, a, b in sorted(improvements, key=lambda r: r[2] - r[1]):
        print(f"improved  {name}: {a}s -> {b}s ({b / a:.2f}x)")
    if not regressions:
        print("no regressions above threshold")

    # scan-throughput tripwire (round-4 verdict: the rps dipped 9%
    # unnoticed; flag any further +/-15% drift so feature cost in the
    # scan loop is a decision, not an accident)
    scan_ok = True
    o_rps = (old.get("scan") or {}).get("rps")
    n_rps = (new.get("scan") or {}).get("rps")
    if o_rps and n_rps:
        drift = (n_rps - o_rps) / o_rps
        tag = "SCAN REGRESSION" if drift < -0.15 else (
            "scan improved" if drift > 0.15 else "scan ok")
        print(f"{tag}: {o_rps} -> {n_rps} resources/s ({drift:+.1%})")
        scan_ok = drift >= -0.15
    elif n_rps:
        print(f"scan: {n_rps} resources/s (no prior number)")
    elif o_rps:
        # the metric disappearing is exactly the drift this tripwire
        # exists to catch — fail loudly, don't silently pass
        print("SCAN METRIC MISSING: prior bench had "
              f"{o_rps} resources/s, new bench has no scan block")
        scan_ok = False
    return 1 if regressions or not scan_ok else 0


if __name__ == "__main__":
    sys.exit(main())
