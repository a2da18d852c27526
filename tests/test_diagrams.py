"""Diagram rendering: Spark-side shrink + driver-side mermaid/ascii."""

from __future__ import annotations

from corkscrew_spark import diagrams
from corkscrew_spark.ingest import synthetic


def test_mermaid_and_ascii(spark):
    res = synthetic.resources(spark, n=60)
    rel = synthetic.relationships(spark, res)
    nodes, edges = diagrams.diagram_data(res, rel, service="s3", limit=10)
    assert 0 < len(nodes) <= 10
    assert all(n.service == "s3" for n in nodes)
    kept = {n.id for n in nodes}
    assert all(e.from_id in kept and e.to_id in kept for e in edges)

    mm = diagrams.render_mermaid(nodes, edges)
    assert mm.startswith("graph TB")
    assert "subgraph s3" in mm
    # node ids are sanitized — no raw colons from ARNs
    body = mm.split("\n", 1)[1]
    for n in nodes:
        assert diagrams._safe_id(n.id) in body

    ascii_art = diagrams.render_ascii(nodes, edges)
    assert "s3 (" in ascii_art
    for n in nodes:
        assert n.name[:20] in ascii_art


def test_diagram_limit_is_deterministic(spark):
    res = synthetic.resources(spark, n=60)
    rel = synthetic.relationships(spark, res)
    a = diagrams.diagram_data(res, rel, limit=7)[0]
    b = diagrams.diagram_data(res, rel, limit=7)[0]
    assert [n.id for n in a] == [n.id for n in b]
