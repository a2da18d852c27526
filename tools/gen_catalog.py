"""Regenerate QUERY_CATALOG.md from the query registry."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as e
    from corkscrew_spark.plans.queries import ORACLE

    lines = [
        "# Query catalog",
        "",
        "Auto-generated from the registry (`python -m tools.gen_catalog` —",
        "regenerate after adding queries). One row per registered query:",
        "correctness mode, implementing module, and summary.",
        "",
        "| # | Query | Correctness | Module | Summary |",
        "|---|---|---|---|---|",
    ]
    qs = e.queries()
    for i, (name, fn) in enumerate(qs.items()):
        mode = "oracle" if name in ORACLE else "rows-only + invariant tests"
        if name in e._DEFERRED:
            mode += " (deferred window)"
        elif name not in e._DRIVER_RECORDED:
            mode += " (r5 window)"
        doc = (fn.__doc__ or "").strip().split("\n")[0].rstrip(".")
        doc = doc.replace("|", "\\|")
        mod = fn.__module__.replace("corkscrew_spark.", "")
        lines.append(f"| {i} | `{name}` | {mode} | `{mod}` | {doc} |")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "QUERY_CATALOG.md")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {len(qs)} rows to {path}")


if __name__ == "__main__":
    main()
