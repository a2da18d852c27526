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
from pyspark.sql import functions as F

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
            meta = {
                "name": f"{kind.lower()}-{i:03d}",
                "uid": hashlib.sha256(f"{self._cluster}|{gvr}|{i}".encode()).hexdigest()[:16],
                "namespace": _NAMESPACES[i % 3] if namespaced else None,
                "labels": labels,
                "creationTimestamp": "2024-01-01T00:00:00Z",
            }
            obj = {
                "kind": kind,
                "metadata": meta,
                "status": {"phase": ("Running", "Pending")[i % 7 == 0]},
            }
            # Relationship-bearing spec fields, mirroring what real
            # manifests carry (extract_relationships parses these):
            if gvr == "v1/pods":
                # pod i is owned by deployment i%3 (same namespace by
                # construction: both index into _NAMESPACES with i%3)
                j = i % 3
                meta["ownerReferences"] = [{
                    "kind": "Deployment",
                    "name": f"deployment-{j:03d}",
                    "uid": hashlib.sha256(
                        f"{self._cluster}|apps/v1/deployments|{j}".encode()
                    ).hexdigest()[:16],
                }]
                vol = [
                    {"name": "cfg", "configMap": {"name": f"configmap-{i % 5:03d}"}},
                    {"name": "sec", "secret": {"secretName": f"secret-{i % 4:03d}"}},
                    {"name": "data", "persistentVolumeClaim": {"claimName": f"pvc-{i % 4:03d}"}},
                ][i % 3]
                obj["spec"] = {"volumes": [vol]}
            elif gvr == "v1/services":
                obj["spec"] = {"selector": {"app": ("web", "db", "cache")[i % 3]}}
            items.append(obj)
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
        error_code=None,
        error_message=None,
    )


def _scan_partition(rows: Iterator[Row], label_selector: str | None,
                    scanned_at: dt.datetime, use_sdk: bool,
                    client_factory=None, max_retries: int = 3,
                    retry_base_s: float = 0.2) -> Iterator[Row]:
    from corkscrew_spark.ingest.aws_scanner import _error_row
    from corkscrew_spark.ingest.faults import call_with_retry

    for work in rows:
        cluster, gvr = work.cluster, work.gvr
        # Only an injected client can serve a GVR the fake doesn't know —
        # use_sdk documents intent but never builds a real client here,
        # so without a factory an unknown GVR must skip, not KeyError.
        if gvr not in KNOWN_GVRS and client_factory is None:
            continue

        # Memory trade-off: fetch accumulates EVERY page of one
        # (cluster, gvr) listing before yielding, so a retry replays
        # the whole listing atomically (no duplicate rows from a
        # half-consumed iterator). The cost is O(listing) executor
        # memory for that one GVR; clusters with pathological object
        # counts should shrink the unit of work (more granular GVR/
        # namespace work rows) rather than stream-and-retry per page,
        # which would need dedup state to stay exactly-once.
        def fetch(cluster=cluster, gvr=gvr):
            if client_factory is not None:
                # DI seam: same contract as the fake (list(gvr, ...) with
                # continue-token paging) — a picklable factory built on
                # each executor can wrap kubernetes.dynamic or a
                # recorded fixture
                client = client_factory(cluster)
            else:
                client = _FakeDynamicClient(cluster)  # use_sdk would build kubernetes.dynamic here
            items, token = [], None
            while True:
                resp = client.list(gvr, label_selector=label_selector,
                                   _continue=token)
                items.extend(resp["items"])
                token = resp["metadata"].get("continue")
                if not token:
                    return items

        # Shared fault policy (ingest/faults.py): a 429'd cell retries
        # with backoff (k8s ApiException carries .status -> status_code
        # when wrapped); a forbidden GVR records one error row and the
        # fan-out continues — RBAC gaps are routine in cluster scans.
        items, err = call_with_retry(fetch, max_retries, retry_base_s)
        if err is not None:
            yield _error_row(gvr, cluster, scanned_at, *err,
                             provider="k8s", account_id=cluster)
            continue
        for obj in items:
            yield _to_resource(cluster, gvr, obj, scanned_at)


def scan_with_errors(spark: SparkSession, clusters: list[str],
                     gvrs: list[str] | None = None,
                     label_selector: str | None = None,
                     use_sdk: bool = False,
                     scanned_at: dt.datetime | None = None,
                     client_factory=None, max_retries: int = 3,
                     retry_base_s: float = 0.2) -> DataFrame:
    """``scan`` including the error side-channel
    (aws_scanner.SCAN_RESULT_SCHEMA): a failed (cluster, gvr) cell —
    throttled past retries, or RBAC-forbidden — appears as one error
    row instead of a dead task."""
    from corkscrew_spark.ingest.aws_scanner import SCAN_RESULT_SCHEMA

    gvrs = gvrs or sorted(KNOWN_GVRS)
    work = [Row(cluster=c, gvr=g) for c in clusters for g in gvrs]
    n = min(len(work), spark.sparkContext.defaultParallelism)
    scanned_at = scanned_at or dt.datetime.now(dt.timezone.utc)
    work_df = spark.createDataFrame(work).repartition(n)
    return spark.createDataFrame(
        work_df.rdd.mapPartitions(
            lambda it: _scan_partition(it, label_selector, scanned_at,
                                       use_sdk,
                                       client_factory=client_factory,
                                       max_retries=max_retries,
                                       retry_base_s=retry_base_s)
        ),
        SCAN_RESULT_SCHEMA,
    )


def scan(spark: SparkSession, clusters: list[str], gvrs: list[str] | None = None,
         label_selector: str | None = None, use_sdk: bool = False,
         scanned_at: dt.datetime | None = None,
         client_factory=None) -> DataFrame:
    """List every (cluster, gvr) cell across executors; selectors are
    pushed to the (fake) API server, pagination uses continue tokens.

    ``client_factory``: picklable ``cluster -> client`` built on each
    executor, speaking the same ``list(gvr, label_selector, _continue)``
    protocol as the fake — the seam for kubernetes.dynamic or
    recorded-fixture clients (mirrors aws_scanner.client_factory).
    Failed cells are dropped from this resources-only surface; use
    ``scan_with_errors`` for accounting."""
    from pyspark.sql import functions as F

    return (
        scan_with_errors(spark, clusters, gvrs, label_selector, use_sdk,
                         scanned_at, client_factory)
        .filter(F.col("error_code").isNull())
        .drop("error_code", "error_message")
    )


#: the spec/metadata subset relationship extraction parses — from_json
#: with a partial schema: absent fields read as NULL, extra fields are
#: ignored (schema-on-read over the raw manifest column)
_REL_SCHEMA = (
    "STRUCT<"
    "metadata: STRUCT<"
    "  ownerReferences: ARRAY<STRUCT<kind: STRING, name: STRING, uid: STRING>>"
    ">, "
    "spec: STRUCT<"
    "  selector: MAP<STRING, STRING>, "
    "  volumes: ARRAY<STRUCT<"
    "    configMap: STRUCT<name: STRING>, "
    "    secret: STRUCT<secretName: STRING>, "
    "    persistentVolumeClaim: STRUCT<claimName: STRING>"
    "  >>"
    ">>"
)


def extract_relationships(resources: DataFrame) -> DataFrame:
    """Typed relationship edges from scanned K8s manifests — parity with
    the reference's extractBasicRelationships
    (plugins/kubernetes-provider/kubernetes_provider.go; kinds per
    IMPLEMENTATION_STATUS.md): OWNED_BY (ownerReferences), SELECTS /
    SELECTED_BY (service spec.selector ⊆ pod labels), MOUNTS
    (configMap / secret / PVC volumes).

    Spark shape: the manifest JSON parses once per row with a partial
    schema (no Python in the row path); owner and mount targets resolve
    to scanned resource ids via (cluster, kind, namespace, name)
    equi-joins — unresolved targets (e.g. unscanned Secrets) keep a
    deterministic name-based id, matching the reference's behavior of
    emitting the edge anyway. Selector matching explodes (service,
    key, value) pairs against pod label entries and keeps pairs whose
    match count equals the selector size — a label-subset join, never
    services × pods.

    Returns RELATIONSHIP_SCHEMA-shaped rows.
    """
    parsed = resources.select(
        "id", "name", "type", "region", "account_id", "tags", "scanned_at",
        F.from_json("raw_data", _REL_SCHEMA).alias("j"),
    ).localCheckpoint(eager=True)

    ids = parsed.select(
        F.col("region").alias("t_cluster"), F.col("type").alias("t_kind"),
        F.col("account_id").alias("t_ns"), F.col("name").alias("t_name"),
        F.col("id").alias("t_id"),
    )

    def resolve(edges: DataFrame, rel_type: str) -> DataFrame:
        """(from_id, cluster, kind, ns, name, props) -> RELATIONSHIP rows
        with the target resolved to a scanned id when present."""
        return (
            edges.join(
                ids,
                (edges["cluster"] == ids["t_cluster"])
                & (edges["kind"] == ids["t_kind"])
                & (edges["ns"].eqNullSafe(ids["t_ns"]))
                & (edges["tname"] == ids["t_name"]),
                "left",
            )
            .select(
                "from_id",
                F.coalesce(
                    "t_id",
                    F.concat(F.lit("k8s://unresolved/"), "kind", F.lit("/"),
                             F.coalesce("ns", F.lit("_cluster")),
                             F.lit("/"), "tname"),
                ).alias("to_id"),
                F.lit(rel_type).alias("relationship_type"),
                F.lit("kubernetes").alias("provider"),
                F.col("subtype").alias("relationship_subtype"),
                F.col("props").alias("properties"),
                F.col("from_kind").alias("from_resource_type"),
                F.col("kind").alias("to_resource_type"),
                F.lit("outbound").alias("direction"),
                F.lit(None).cast("timestamp").alias("created_at"),
                F.col("scanned_at").alias("discovered_at"),
            )
        )

    owners = resolve(
        parsed.select(
            F.col("id").alias("from_id"), F.col("type").alias("from_kind"),
            F.col("region").alias("cluster"), F.col("account_id").alias("ns"),
            "scanned_at",
            F.explode("j.metadata.ownerReferences").alias("o"),
        ).select(
            "from_id", "from_kind", "cluster", "ns", "scanned_at",
            F.col("o.kind").alias("kind"), F.col("o.name").alias("tname"),
            F.lit("owner_reference").alias("subtype"),
            F.to_json(F.struct(F.col("o.uid").alias("owner_uid"))).alias("props"),
        ),
        "OWNED_BY",
    )

    vols = parsed.filter(F.col("type") == "Pod").select(
        F.col("id").alias("from_id"), F.col("type").alias("from_kind"),
        F.col("region").alias("cluster"), F.col("account_id").alias("ns"),
        "scanned_at", F.explode("j.spec.volumes").alias("v"),
    )
    mounts = resolve(
        vols.select(
            "from_id", "from_kind", "cluster", "ns", "scanned_at",
            F.coalesce(
                F.when(F.col("v.configMap.name").isNotNull(), F.lit("ConfigMap")),
                F.when(F.col("v.secret.secretName").isNotNull(), F.lit("Secret")),
                F.when(F.col("v.persistentVolumeClaim.claimName").isNotNull(),
                       F.lit("PersistentVolumeClaim")),
            ).alias("kind"),
            F.coalesce("v.configMap.name", "v.secret.secretName",
                       "v.persistentVolumeClaim.claimName").alias("tname"),
            F.lit("volume").alias("subtype"),
            F.lit(None).cast("string").alias("props"),
        ).filter(F.col("kind").isNotNull()),
        "MOUNTS",
    )

    # Service selector ⊆ pod labels, within (cluster, namespace)
    sel = (
        parsed.filter(
            (F.col("type") == "Service") & (F.size("j.spec.selector") > 0))
        .select(
            F.col("id").alias("svc_id"), F.col("region").alias("cluster"),
            F.col("account_id").alias("ns"), "scanned_at",
            F.size("j.spec.selector").alias("n_sel"),
            F.explode("j.spec.selector").alias("k", "v"),
        )
    )
    pod_labels = (
        parsed.filter((F.col("type") == "Pod") & F.col("tags").isNotNull())
        .select(
            F.col("id").alias("pod_id"), F.col("region").alias("cluster"),
            F.col("account_id").alias("ns"),
            F.explode("tags").alias("k", "v"),
        )
    )
    matched = (
        sel.join(pod_labels, ["cluster", "ns", "k", "v"])
        .groupBy("svc_id", "pod_id", "n_sel", "scanned_at")
        .agg(F.count(F.lit(1)).alias("hits"))
        .filter(F.col("hits") == F.col("n_sel"))
    )
    selects = matched.select(
        F.col("svc_id").alias("from_id"), F.col("pod_id").alias("to_id"),
        F.lit("SELECTS").alias("relationship_type"),
        F.lit("kubernetes").alias("provider"),
        F.lit("label_selector").alias("relationship_subtype"),
        F.lit(None).cast("string").alias("properties"),
        F.lit("Service").alias("from_resource_type"),
        F.lit("Pod").alias("to_resource_type"),
        F.lit("outbound").alias("direction"),
        F.lit(None).cast("timestamp").alias("created_at"),
        F.col("scanned_at").alias("discovered_at"),
    )
    selected_by = selects.select(
        F.col("to_id").alias("from_id"), F.col("from_id").alias("to_id"),
        F.lit("SELECTED_BY").alias("relationship_type"),
        "provider",
        "relationship_subtype", "properties",
        F.col("to_resource_type").alias("from_resource_type"),
        F.col("from_resource_type").alias("to_resource_type"),
        F.lit("inbound").alias("direction"), "created_at", "discovered_at",
    )
    return owners.unionByName(mounts).unionByName(selects).unionByName(selected_by)
