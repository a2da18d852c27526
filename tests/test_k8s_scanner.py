"""K8s scanner: GVR fan-out, continue-token pagination, selector pushdown."""

from __future__ import annotations

from pyspark.sql import functions as F

from corkscrew_spark.ingest import k8s_scanner
from corkscrew_spark.schema import RESOURCE_SCHEMA


def test_scan_all_gvrs(spark):
    df = k8s_scanner.scan(spark, ["c1", "c2"])
    assert df.schema == RESOURCE_SCHEMA
    rows = df.collect()
    assert len(rows) >= 2 * len(k8s_scanner.KNOWN_GVRS) * 9
    assert len({r.id for r in rows}) == len(rows)
    svcs = {r.service for r in rows}
    assert "pods" in svcs and "widgets" in svcs  # CRDs list like builtins
    assert {r.region for r in rows} == {"c1", "c2"}


def test_label_selector_pushdown(spark):
    full = k8s_scanner.scan(spark, ["c1"], gvrs=["v1/pods"]).count()
    web = k8s_scanner.scan(spark, ["c1"], gvrs=["v1/pods"], label_selector="app=web")
    rows = web.collect()
    assert 0 < len(rows) < full
    assert all(r.tags["app"] == "web" for r in rows)


def test_pagination_covers_all_items(spark):
    # page size 7 vs 9..23 items per cell forces multi-page listings;
    # uniqueness + count prove the continue-token loop stitched pages.
    df = k8s_scanner.scan(spark, ["c1"], gvrs=["apps/v1/deployments"])
    rows = df.collect()
    assert len(rows) > 7
    assert len({r.name for r in rows}) == len(rows)


def test_cluster_scoped_resources_have_no_namespace(spark):
    nodes = k8s_scanner.scan(spark, ["c1"], gvrs=["v1/nodes"]).collect()
    assert nodes and all(r.account_id is None for r in nodes)
    assert all("/_cluster/" in r.id for r in nodes)


class TestRelationshipExtraction:
    """extractBasicRelationships parity: OWNED_BY, SELECTS/SELECTED_BY,
    MOUNTS, with id resolution and name-fallback."""

    def _rels(self, spark):
        from corkscrew_spark.ingest import k8s_scanner

        res = k8s_scanner.scan(spark, ["c1"])
        return res, k8s_scanner.extract_relationships(res)

    def test_owned_by_resolves_to_deployment(self, spark):
        res, rels = self._rels(spark)
        owned = rels.filter("relationship_type = 'OWNED_BY'").collect()
        assert owned, "pods must carry ownerReferences"
        dep_ids = {r.id for r in res.filter("type = 'Deployment'").collect()}
        for e in owned:
            assert e.from_resource_type == "Pod"
            assert e.to_resource_type == "Deployment"
            assert e.to_id in dep_ids, "owner must resolve to a scanned id"
            assert "owner_uid" in (e.properties or "")

    def test_selects_requires_full_label_match(self, spark):
        from pyspark.sql import functions as F
        res, rels = self._rels(spark)
        sel = rels.filter("relationship_type = 'SELECTS'")
        pods = {r.id: r.tags for r in res.filter("type = 'Pod'").collect()}
        svcs = {r.id: r.raw_data for r in res.filter("type = 'Service'").collect()}
        import json as _json
        rows = sel.collect()
        assert rows
        for e in rows:
            want = _json.loads(svcs[e.from_id])["spec"]["selector"]
            have = pods[e.to_id]
            assert all(have.get(k) == v for k, v in want.items())
        # inverse edges exist 1:1
        n_selected = rels.filter("relationship_type = 'SELECTED_BY'").count()
        assert n_selected == len(rows)
        # services and pods only pair within the same namespace
        joined = (sel.alias("e")
                  .join(res.select(F.col("id").alias("from_id"),
                                   F.col("account_id").alias("sns")), "from_id")
                  .join(res.select(F.col("id").alias("to_id"),
                                   F.col("account_id").alias("pns")), "to_id"))
        assert joined.filter("sns != pns").count() == 0

    def test_mounts_resolution_and_fallback(self, spark):
        res, rels = self._rels(spark)
        mounts = rels.filter("relationship_type = 'MOUNTS'").collect()
        kinds = {e.to_resource_type for e in mounts}
        assert "ConfigMap" in kinds and "Secret" in kinds
        cm_ids = {r.id for r in res.filter("type = 'ConfigMap'").collect()}
        resolved = [e for e in mounts if e.to_resource_type == "ConfigMap"
                    and e.to_id in cm_ids]
        assert resolved, "same-namespace configmap mounts must resolve"
        secrets = [e for e in mounts if e.to_resource_type == "Secret"]
        assert all(e.to_id.startswith("k8s://unresolved/Secret/")
                   for e in secrets), "unscanned Secrets keep name-based ids"

    def test_schema_matches_relationship_table(self, spark):
        from corkscrew_spark.schema import RELATIONSHIP_SCHEMA
        _res, rels = self._rels(spark)
        assert [f.name for f in RELATIONSHIP_SCHEMA.fields] == rels.columns


def test_injected_client_factory(spark):
    """client_factory seam: a closure-built client speaking the fake's
    list/continue protocol runs through the whole scan loop (the shape
    kubernetes.dynamic would take on a real cluster)."""
    import datetime as dt

    from corkscrew_spark.ingest import k8s_scanner
    from corkscrew_spark.schema import RESOURCE_SCHEMA

    def factory(cluster):
        class Client:
            def list(self, gvr, label_selector=None, _continue=None):
                if _continue is None:  # page 1 -> continue token
                    return {"items": [{"metadata": {
                                "name": f"{cluster}-pod-1", "uid": "u1",
                                "namespace": "default",
                                "labels": {"app": "web"}},
                                "kind": "Pod", "status": {"phase": "Running"}}],
                            "metadata": {"continue": "t1"}}
                return {"items": [{"metadata": {
                            "name": f"{cluster}-pod-2", "uid": "u2",
                            "namespace": "default"},
                            "kind": "Pod", "status": {"phase": "Pending"}}],
                        "metadata": {}}
        return Client()

    df = k8s_scanner.scan(spark, ["c1"], gvrs=["v1/pods"],
                          scanned_at=dt.datetime(2024, 1, 1),
                          client_factory=factory)
    assert df.schema == RESOURCE_SCHEMA
    names = sorted(r.name for r in df.collect())
    assert names == ["c1-pod-1", "c1-pod-2"]  # page 2 via continue token


class TestK8sFaultModes:
    """Shared fault policy on the k8s seam: RBAC-forbidden GVRs record
    one error row and the fan-out continues; 429s retry."""

    def test_forbidden_gvr_records_and_continues(self, spark):
        from corkscrew_spark.ingest import k8s_scanner

        def factory(cluster):
            class Client:
                def list(self, gvr, label_selector=None, _continue=None):
                    if gvr == "v1/secrets":
                        class Forbidden(Exception):
                            status_code = 403
                        raise Forbidden("secrets is forbidden: RBAC")
                    return {"items": [{"apiVersion": "v1", "kind": "Pod",
                                       "metadata": {"name": "p1",
                                                    "uid": "u1",
                                                    "namespace": "default"}}],
                            "metadata": {}}
            return Client()

        raw = k8s_scanner.scan_with_errors(
            spark, ["c1"], gvrs=["v1/pods", "v1/secrets"],
            client_factory=factory).collect()
        errs = [r for r in raw if r.error_code is not None]
        good = [r for r in raw if r.error_code is None]
        assert len(errs) == 1
        assert errs[0].error_code == "Forbidden"
        assert errs[0].service == "v1/secrets" and errs[0].provider == "k8s"
        assert [r.name for r in good] == ["p1"]
        # plain surface drops the forbidden cell
        names = [r.name for r in k8s_scanner.scan(
            spark, ["c1"], gvrs=["v1/pods", "v1/secrets"],
            client_factory=factory).collect()]
        assert names == ["p1"]

    def test_throttled_list_retries_then_succeeds(self, spark):
        from corkscrew_spark.ingest import k8s_scanner

        def make_factory():
            calls = {"n": 0}

            def factory(cluster):
                class Client:
                    def list(self, gvr, label_selector=None, _continue=None):
                        calls["n"] += 1
                        if calls["n"] < 3:
                            class TooMany(Exception):
                                status_code = 429
                            raise TooMany("apiserver overloaded")
                        return {"items": [{"apiVersion": "v1",
                                           "kind": "Pod",
                                           "metadata": {"name": "ok",
                                                        "uid": "u",
                                                        "namespace": "d"}}],
                                "metadata": {}}
                return Client()

            return factory

        raw = k8s_scanner.scan_with_errors(
            spark, ["c1"], gvrs=["v1/pods"], client_factory=make_factory(),
            retry_base_s=0.01).collect()
        assert [r.error_code for r in raw] == [None]
        assert raw[0].name == "ok"

    def test_real_apiexception_shape_classified(self, spark):
        """kubernetes.client.ApiException carries `.status` (not
        `.status_code`) — the classifier must still map 403 -> Forbidden
        so RBAC faults record instead of generically erroring."""
        from corkscrew_spark.ingest import k8s_scanner

        def factory(cluster):
            class Client:
                def list(self, gvr, label_selector=None, _continue=None):
                    class ApiException(Exception):
                        status = 403
                        reason = "Forbidden"
                    raise ApiException("(403) Reason: Forbidden")
            return Client()

        raw = k8s_scanner.scan_with_errors(
            spark, ["c1"], gvrs=["v1/pods"], client_factory=factory).collect()
        assert len(raw) == 1 and raw[0].error_code == "Forbidden"
