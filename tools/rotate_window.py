#!/usr/bin/env python
"""Round-start window rotation for __spark_entry__.py.

The round driver records correctness rows for only the FIRST 50 entries
of queries(). This tool automates the upkeep documented in
__spark_entry__.py and the verify skill:

1. fold every name recorded in CORRECTNESS_r{N}.json files into
   _DRIVER_RECORDED (they are proven; they yield their slot);
2. rebuild _WINDOW from the not-yet-recorded backlog in queries()
   registration order (oldest registrations first), 50 names;
3. rewrite the three literals in __spark_entry__.py in place.

Run it at round start, then VERIFY the new window before pinning:

    python tools/rotate_window.py            # rewrite the lists
    python tools/driver_sim.py --window 50   # must be 50/50 green

--dry-run prints the would-be window without touching the file.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ENTRY = os.path.join(REPO, "__spark_entry__.py")


def _fmt_set(names: list[str], indent: str = "    ") -> str:
    lines, line = [], indent
    for n in sorted(names):
        tok = f'"{n}", '
        if len(line) + len(tok) > 78:
            lines.append(line.rstrip())
            line = indent
        line += tok
    if line.strip():
        lines.append(line.rstrip())
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--window-size", type=int, default=50)
    args = ap.parse_args()

    recorded: set[str] = set()
    latest_round: dict[str, int] = {}  # name -> newest round with a row
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as fh:
            for name in json.load(fh):
                recorded.add(name)
                latest_round[name] = max(latest_round.get(name, 0), rnd)
    if not recorded:
        print("no CORRECTNESS_r*.json files found", file=sys.stderr)
        return 1

    from corkscrew_spark.plans.queries import QUERIES

    registration_order = list(QUERIES)  # dict preserves registration order
    backlog = [n for n in registration_order if n not in recorded]
    window = backlog[: args.window_size]
    # pad a short backlog with the STALEST-recorded names: rows age as
    # refactors pile on top of them, so re-verification slots go to the
    # names whose newest green row is oldest (ties: registration order)
    if len(window) < args.window_size:
        reg_pos = {n: i for i, n in enumerate(registration_order)}
        stalest = sorted(
            (n for n in registration_order if n in recorded),
            key=lambda n: (latest_round[n], reg_pos[n]))
        window += stalest[: args.window_size - len(window)]

    print(f"recorded: {len(recorded)}  backlog: {len(backlog)}  "
          f"window: {len(window)}")
    for n in window:
        print(f"  {n}")
    if args.dry_run:
        return 0

    src = open(ENTRY).read()
    new_recorded = _fmt_set(sorted(recorded & set(registration_order)))
    src = re.sub(
        r"_DRIVER_RECORDED = frozenset\(\{.*?\}\)",
        "_DRIVER_RECORDED = frozenset({\n" + new_recorded + "\n})",
        src, flags=re.S)
    src = re.sub(
        r"_DEFERRED = frozenset\(\{.*?\}\)",
        "_DEFERRED = frozenset()  # rebuilt by tools/rotate_window.py: the\n"
        "# backlog is now derived from registration order minus "
        "_DRIVER_RECORDED",
        src, flags=re.S)
    window_body = "".join(f'    "{n}",\n' for n in window)
    src = re.sub(r"_WINDOW = \(.*?\n\)", "_WINDOW = (\n" + window_body + ")",
                 src, flags=re.S)
    open(ENTRY, "w").write(src)
    print(f"rewrote {ENTRY} — now run: python tools/driver_sim.py --window "
          f"{args.window_size}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
