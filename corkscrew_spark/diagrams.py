"""Mermaid / ASCII diagram rendering from query results.

Parity with the reference's diagram tool (diagrams/pkg/renderer/
mermaid.go:44-130, ascii.go:61-160; data prep diagrams/pkg/graph/
converter.go:25-110): resources become nodes grouped by service,
relationships become typed edges. Rendering is driver-side over a
COLLECTED result — the Spark job is the filtering/aggregation that
shrinks the graph to diagram size (the reference caps at LIMIT 50,
converter.go:84-103); never render an uncollected table.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _safe_id(raw: str) -> str:
    """Mermaid node ids must be alphanumeric-ish."""
    return re.sub(r"[^A-Za-z0-9_]", "_", raw)


def diagram_data(resources: DataFrame, relationships: DataFrame,
                 service: str | None = None, region: str | None = None,
                 limit: int = 50) -> tuple[list, list]:
    """Shrink the graph Spark-side (converter.go:84-103: dynamic AND
    filters + ORDER BY type,name LIMIT 50), then collect nodes and the
    edges whose endpoints both survived the cut (semi-join pruning)."""
    r = resources
    if service:
        r = r.filter(F.col("service") == service)
    if region:
        r = r.filter(F.col("region") == region)
    nodes_df = r.select("id", "name", "type", "service").orderBy("type", "name").limit(limit)
    kept = nodes_df.select("id")
    edges_df = (
        relationships.join(kept.withColumnRenamed("id", "from_id"), "from_id", "left_semi")
        .join(kept.withColumnRenamed("id", "to_id"), "to_id", "left_semi")
        .select("from_id", "to_id", "relationship_type")
        .orderBy("from_id", "to_id", "relationship_type")
    )
    return nodes_df.collect(), edges_df.collect()


def render_mermaid(nodes: list, edges: list, direction: str = "TB") -> str:
    """Mermaid flowchart: subgraph per service, labeled typed edges
    (mermaid.go:44-130)."""
    lines = [f"graph {direction}"]
    by_service: dict[str, list] = {}
    for n in nodes:
        by_service.setdefault(n.service or "unknown", []).append(n)
    for svc in sorted(by_service):
        lines.append(f"    subgraph {_safe_id(svc)}")
        for n in sorted(by_service[svc], key=lambda x: x.id):
            label = f"{n.name}<br/>{n.type}" if n.type else n.name
            lines.append(f'        {_safe_id(n.id)}["{label}"]')
        lines.append("    end")
    for e in edges:
        lines.append(
            f"    {_safe_id(e.from_id)} -->|{e.relationship_type}| {_safe_id(e.to_id)}"
        )
    return "\n".join(lines)


def render_ascii(nodes: list, edges: list, width: int = 72) -> str:
    """Boxed-list ASCII rendering (ascii.go:61-160): service sections,
    node lines, then an edge list — terminal-friendly, width-capped."""
    out: list[str] = []
    by_service: dict[str, list] = {}
    for n in nodes:
        by_service.setdefault(n.service or "unknown", []).append(n)
    for svc in sorted(by_service):
        title = f" {svc} ({len(by_service[svc])}) "
        out.append("+" + title.center(width - 2, "-") + "+")
        for n in sorted(by_service[svc], key=lambda x: x.id):
            line = f"  {n.name}  [{n.type}]"
            out.append("|" + line[: width - 2].ljust(width - 2) + "|")
        out.append("+" + "-" * (width - 2) + "+")
    if edges:
        out.append("")
        out.append("Relationships:")
        for e in edges:
            out.append(f"  {e.from_id} --{e.relationship_type}--> {e.to_id}")
    return "\n".join(out)
