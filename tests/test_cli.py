"""CLI verb tests — offline, exercising the same dispatch a user hits.

Parity: cmd/corkscrew/main.go runDiscover (:250), runList (:318),
runDescribe (:471); query/pack verbs are covered indirectly by
test_engine/test_compliance.
"""

from __future__ import annotations

import json

import pytest

from corkscrew_spark import cli


@pytest.fixture(autouse=True)
def _reuse_session(spark, monkeypatch):
    """CLI verbs build their own session; reuse the test one."""
    monkeypatch.setattr("corkscrew_spark.session.get_spark", lambda **kw: spark)
    monkeypatch.setattr("corkscrew_spark.cli.get_spark", lambda **kw: spark)


def test_discover_table(capsys):
    assert cli.main(["discover", "--provider", "aws"]) == 0
    out = capsys.readouterr().out
    assert "6 services" in out
    assert "s3" in out and "list_buckets" in out


def test_discover_json_all_providers(capsys):
    for provider in ("aws", "azure", "gcp", "kubernetes"):
        assert cli.main(["discover", "--provider", provider, "--output", "json"]) == 0
        doc = json.loads(capsys.readouterr().out)
        assert doc["provider"] == provider and doc["services"]


def test_list_refs(capsys):
    rc = cli.main(["list", "--services", "s3,iam", "--region", "us-east-1",
                   "--limit", "10", "--format", "csv"])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[0] == "id,name,type,service,region,state"
    assert 1 < len(lines) <= 11
    # iam sorts before s3, so the first page is iam refs
    assert any("arn:aws:iam" in ln for ln in lines[1:])


def test_list_type_filter(capsys):
    rc = cli.main(["list", "--services", "s3,iam", "--type", "AWS::IAM::User",
                   "--format", "json"])
    assert rc == 0
    rows = json.loads(capsys.readouterr().out)
    assert rows and all(r["type"] == "AWS::IAM::User" for r in rows)


def test_list_search_query(capsys):
    rc = cli.main(["list", "--query", "service:s3 region:us-east-1",
                   "--format", "json"])
    assert rc == 0
    rows = json.loads(capsys.readouterr().out)
    assert rows and all(r["service"] == "s3" for r in rows)


def test_describe_by_arn(capsys):
    # grab a real id from a list, then describe it
    assert cli.main(["list", "--services", "s3", "--limit", "1",
                     "--format", "json"]) == 0
    rid = json.loads(capsys.readouterr().out)[0]["id"]
    assert cli.main(["describe", "--resource-id", rid, "--output", "json"]) == 0
    doc = json.loads(capsys.readouterr().out)
    assert len(doc) == 1 and doc[0]["id"] == rid
    # description enrichment happened
    assert "Describe" in doc[0]["raw_data"]
    # yaml-ish output path
    assert cli.main(["describe", "--resource-id", rid]) == 0
    out = capsys.readouterr().out
    assert out.startswith("id: ") and "raw_data:" in out


def test_describe_not_found(capsys):
    rc = cli.main(["describe", "--resource-id", "arn:aws:s3:us-east-1:1:nope"])
    assert rc == 1
    assert "not found" in capsys.readouterr().err


def test_describe_requires_service_for_bare_id(capsys):
    rc = cli.main(["describe", "--resource-id", "not-an-arn"])
    assert rc == 2
    assert "--service is required" in capsys.readouterr().err


def test_kql_verb(capsys):
    rc = cli.main([
        "kql",
        "documents | where lang == 'en' | summarize n = count() by source "
        "| order by source asc",
        "--data", "/root/testdata/sf0.001", "--format", "csv"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.splitlines()[0] == "source,n"
    assert len(out.splitlines()) > 1


def test_kql_verb_error_exit_code(capsys):
    rc = cli.main(["kql", "documents | frobnicate",
                   "--data", "/root/testdata/sf0.001"])
    assert rc == 2
    assert "error:" in capsys.readouterr().err


def test_orchestrator_discover_merges_sources(tmp_path, monkeypatch, capsys):
    import yaml
    monkeypatch.setenv("HOME", str(tmp_path))
    monkeypatch.chdir(tmp_path)
    (tmp_path / "corkscrew.yaml").write_text(yaml.safe_dump({
        "providers": {"aws": {"discovery_mode": "manual",
                              "services": {"include": ["s3", "customthing"]}}},
    }))
    extra = tmp_path / "gh.json"
    extra.write_text(json.dumps({"services": ["s3", "fromgithub"]}))
    rc = cli.main(["orchestrator-discover", "--provider", "aws",
                   "--source", str(extra), "--output", "json"])
    assert rc == 0
    doc = json.loads(capsys.readouterr().out)
    svc = doc["services"]
    assert set(svc["s3"]) == {"catalog", "config", str(extra)}
    assert svc["customthing"] == ["config"]
    assert svc["fromgithub"] == [str(extra)]
    # bad source file is skipped with a warning, not fatal
    rc = cli.main(["orchestrator-discover", "--provider", "aws",
                   "--source", str(tmp_path / "missing.json")])
    assert rc == 0


def test_query_from_file(tmp_path, capsys):
    f = tmp_path / "q.sql"
    f.write_text("SELECT doc_id FROM documents ORDER BY doc_id LIMIT 3")
    rc = cli.main(["query", "--file", str(f),
                   "--data", "/root/testdata/sf0.001", "--format", "csv"])
    assert rc == 0
    out = [l for l in capsys.readouterr().out.splitlines() if l]
    assert out[0] == "doc_id" and len(out) == 4


def test_init_bootstrap(tmp_path, capsys, monkeypatch):
    """init creates the workspace tree and seeds a default config
    (init.go:114-230 analog: dirs + deps + config + provider resolve)."""
    monkeypatch.setenv("CORKSCREW_HOME", str(tmp_path / "ws"))
    monkeypatch.setenv("HOME", str(tmp_path))  # keep _config_path off the real home
    monkeypatch.delenv("CORKSCREW_CONFIG_FILE", raising=False)
    monkeypatch.chdir(tmp_path)  # no ./corkscrew.yaml in cwd

    rc = cli.main(["init"])
    out = capsys.readouterr().out
    assert rc == 0
    ws = tmp_path / "ws"
    for sub in ("config", "packs", "warehouse"):
        assert (ws / sub).is_dir()
    assert (ws / "config.yaml").exists()
    assert "initialized successfully" in out
    assert "ok pyspark" in out

    # second run: config already exists, not rewritten (timestamps equal)
    before = (ws / "config.yaml").read_text()
    (ws / "config.yaml").write_text(before + "\n# user edit\n")
    assert cli.main(["init"]) == 0
    assert "# user edit" in (ws / "config.yaml").read_text()
    # --upgrade rewrites the default
    assert cli.main(["init", "--upgrade"]) == 0
    assert "# user edit" not in (ws / "config.yaml").read_text()


def test_init_dry_run_touches_nothing(tmp_path, capsys, monkeypatch):
    monkeypatch.setenv("CORKSCREW_HOME", str(tmp_path / "ws"))
    monkeypatch.setenv("HOME", str(tmp_path))
    monkeypatch.delenv("CORKSCREW_CONFIG_FILE", raising=False)
    monkeypatch.chdir(tmp_path)
    rc = cli.main(["init", "--dry-run"])
    out = capsys.readouterr().out
    assert rc == 0
    assert not (tmp_path / "ws").exists()
    assert "DRY RUN" in out


def test_plugin_list_and_status(capsys):
    assert cli.main(["plugin", "list"]) == 0
    out = capsys.readouterr().out
    for provider in ("aws", "azure", "gcp", "kubernetes"):
        assert provider in out
    assert cli.main(["plugin", "status"]) == 0
    out = capsys.readouterr().out
    assert "loaded" in out and ("offline-fake" in out or "sdk:" in out)
    assert cli.main(["plugin", "build"]) == 0
    assert "nothing to build" in capsys.readouterr().out


def test_schemas_dialects(capsys):
    """main.go:715-793 parity: per-dialect type rendering + JSON output."""
    assert cli.main(["schemas"]) == 0
    duck = capsys.readouterr().out
    assert "-- Dialect: duckdb" in duck
    assert "id VARCHAR NOT NULL" in duck and "CREATE TABLE IF NOT EXISTS" in duck

    assert cli.main(["schemas", "--dialect", "postgres"]) == 0
    pg = capsys.readouterr().out
    assert "id TEXT NOT NULL" in pg and "TIMESTAMP" in pg
    assert "JSONB" in pg  # json-blob columns map to the dialect json type

    assert cli.main(["schemas", "--dialect", "sqlite"]) == 0
    lite = capsys.readouterr().out
    assert "REAL" in lite or "INTEGER" in lite
    assert "JSONB" not in lite

    assert cli.main(["schemas", "--output", "json"]) == 0
    doc = json.loads(capsys.readouterr().out)
    tables = {t["table"] for t in doc}
    assert "resources" in tables
    res = next(t for t in doc if t["table"] == "resources")
    assert {"name", "type", "nullable"} <= set(res["columns"][0])


def test_query_explain(capsys, spark):
    rc = cli.main(["query", "SELECT r_name FROM region WHERE r_regionkey = 1",
                   "--data", "/root/testdata/sf0.001", "--explain"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out
    assert "PushedFilters" in out  # the predicate reached the parquet scan


# ---------------------------------------------------------------------------
# Sampled property-schema inference (DiscoverResourceSchema parity)
# ---------------------------------------------------------------------------

class TestInferResourceSchema:
    def _resources(self, spark):
        import json
        rows = [
            ("r1", "aws_s3_bucket", "us-east-1", {"env": "prod"},
             json.dumps({"versioning": True, "size": 12,
                         "config": {"tier": "STANDARD", "ratio": 0.5},
                         "grants": ["a", "b"]})),
            ("r2", "aws_s3_bucket", "eu-west-1", {"team": "core"},
             json.dumps({"versioning": False, "size": 7,
                         "config": {"tier": "IA"}})),
            ("r3", "aws_s3_bucket", "us-east-1", None,
             json.dumps({"versioning": "Suspended"})),
            ("r4", "aws_ec2_instance", "us-east-1", None,
             json.dumps({"cpu": 4})),
        ]
        return spark.createDataFrame(
            rows, "id string, type string, region string, "
                  "tags map<string,string>, attributes string")

    def test_property_walk_types_and_required(self, spark):
        from corkscrew_spark.schema import infer_resource_schema
        s = infer_resource_schema(self._resources(spark), "aws_s3_bucket",
                                  sample_n=10)
        assert s["sample_count"] == 3
        assert s["locations"] == ["eu-west-1", "us-east-1"]
        assert s["common_tags"] == ["env", "team"]
        props = s["properties"]
        # mixed bool/string resolves to string (priority order)
        assert props["versioning"]["type"] == "string"
        assert props["versioning"]["required"] is True
        assert props["size"] == {"name": "size", "type": "integer",
                                 "required": False, "examples": []}
        # nested object contributes its own path and dotted children
        assert props["config"]["type"] == "object"
        assert props["config.tier"]["type"] == "string"
        assert props["config.ratio"]["type"] == "number"
        assert props["grants"]["type"] == "array"
        # other resource type's properties don't leak in
        assert "cpu" not in props

    def test_empty_type_yields_empty_schema(self, spark):
        from corkscrew_spark.schema import infer_resource_schema
        s = infer_resource_schema(self._resources(spark), "nope")
        assert s["sample_count"] == 0 and s["properties"] == {}


class TestShredJson:
    def test_typed_expansion_and_pruning_semantics(self, spark):
        import json
        from corkscrew_spark.schema import shred_json
        rows = [
            (1, json.dumps({"size": 12, "tier": "hot", "enc": True,
                            "cfg": {"ratio": 0.5}})),
            (2, json.dumps({"size": 7, "tier": "cold"})),
            (3, None),
        ]
        df = spark.createDataFrame(rows, "id long, attrs string")
        out = shred_json(df, "attrs", prefix="a_")
        got = {r.id: r for r in out.collect()}
        assert got[1].a_size == 12 and got[1].a_tier == "hot"
        assert got[1].a_enc is True and got[1].a_cfg.ratio == 0.5
        assert got[2].a_enc is None and got[2].a_cfg is None
        assert got[3].a_size is None
        assert "attrs" not in out.columns  # source dropped by default

    def test_keep_source_and_empty(self, spark):
        from corkscrew_spark.schema import shred_json
        df = spark.createDataFrame([(1, '{"x": 1}')], "id long, attrs string")
        out = shred_json(df, "attrs", drop_source=False)
        assert "attrs" in out.columns and out.collect()[0].x == 1
        empty = spark.createDataFrame([], "id long, attrs string")
        # default drop_source=True applies even with nothing to shred
        assert shred_json(empty, "attrs").columns == ["id"]
        assert shred_json(empty, "attrs",
                          drop_source=False).columns == ["id", "attrs"]

    def test_empty_sample_honors_drop_source(self, spark):
        """drop_source must not be data-dependent: an all-null/empty json
        column still drops when asked (regression: the empty-sample early
        return ignored drop_source)."""
        from corkscrew_spark.schema import shred_json
        allnull = spark.createDataFrame([(1, None)], "id long, attrs string")
        assert shred_json(allnull, "attrs").columns == ["id"]
        assert shred_json(allnull, "attrs",
                          drop_source=False).columns == ["id", "attrs"]


class TestMaintenanceVerb:
    def test_compact_and_history_vacuum(self, spark, tmp_path, capsys):
        from corkscrew_spark import cli, versioned

        # fragmented table -> compact
        tbl = str(tmp_path / "frag")
        spark.range(1000).repartition(24).write.parquet(tbl)
        assert cli.main(["maintenance", "compact", tbl, "--target-mb", "64"]) == 0
        out = capsys.readouterr().out
        assert "compacted" in out and spark.read.parquet(tbl).count() == 1000

        # versioned history + vacuum
        vt = str(tmp_path / "vt")
        for n in (2, 3, 4):
            versioned.write_version(spark.range(n).toDF("id"), vt)
        assert cli.main(["maintenance", "history", vt]) == 0
        assert "v3" in capsys.readouterr().out
        assert cli.main(["maintenance", "vacuum", vt, "--keep-last", "1"]) == 0

    def test_stats_then_skip_plan(self, spark, tmp_path, capsys):
        from corkscrew_spark import cli

        tbl = str(tmp_path / "t")
        spark.range(400).toDF("k").repartitionByRange(
            4, "k").write.parquet(tbl)
        assert cli.main(["maintenance", "stats", tbl, "--cols", "k"]) == 0
        assert "zone maps for 4 files" in capsys.readouterr().out
        assert cli.main(["maintenance", "skip-plan", tbl,
                         "--pred", "k,>=,350"]) == 0
        out = capsys.readouterr().out
        assert "kept 1 files" in out and "pruned 3" in out
        # appends then incremental refresh
        spark.createDataFrame([(999,)], "k long").write.mode(
            "append").parquet(tbl)
        assert cli.main(["maintenance", "stats", tbl, "--refresh"]) == 0
        assert "zone maps for" in capsys.readouterr().out
        # compact with clustering + stats refresh in one call
        assert cli.main(["maintenance", "compact", tbl, "--target-mb", "64",
                         "--sort-by", "k", "--cols", "k"]) == 0
        capsys.readouterr()
        assert cli.main(["maintenance", "skip-plan", tbl,
                         "--pred", "k,between,100,199"]) == 0
        assert "full scan" not in capsys.readouterr().out

    def test_skip_plan_any_union_bound(self, spark, tmp_path, capsys):
        """skip-plan --any ORs the --pred terms (one DNF branch each)
        and reports the union row bound for admission control."""
        from corkscrew_spark import cli

        tbl = str(tmp_path / "t")
        spark.range(800).toDF("k").repartitionByRange(
            8, "k").write.parquet(tbl)
        assert cli.main(["maintenance", "stats", tbl, "--cols", "k"]) == 0
        capsys.readouterr()
        assert cli.main(["maintenance", "skip-plan", tbl, "--any",
                         "--pred", "k,<,50",
                         "--pred", "k,>=,750"]) == 0
        out = capsys.readouterr().out
        assert "kept 2 files" in out and "pruned 6" in out
        assert "<=200" in out and "union bound" in out

    def test_zorder_requires_by(self, tmp_path, capsys, spark):
        from corkscrew_spark import cli
        tbl = str(tmp_path / "z")
        spark.range(10).selectExpr("id as x", "id*2 as y").write.parquet(tbl)
        assert cli.main(["maintenance", "zorder", tbl]) == 2
        assert cli.main(["maintenance", "zorder", tbl, "--by", "x,y",
                         "--out", str(tmp_path / "zz")]) == 0


def test_pack_run_all(capsys):
    from corkscrew_spark import cli

    rc = cli.main(["pack", "run", "--all", "--dry-run"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "demo/tpch-orders" in out and "controls validated" in out


def test_scan_expectations_flags(spark, tmp_path, capsys):
    """--expectations RULES.json gates the scan; --strict-expectations
    aborts with exit 1 and nothing written."""
    import json as _json

    from corkscrew_spark import cli

    rules = [{"name": "impossible", "expr": "provider = 'nope'"}]
    rules_file = tmp_path / "rules.json"
    rules_file.write_text(_json.dumps(rules))
    out = str(tmp_path / "wh")

    rc = cli.main(["scan", "--provider", "aws", "--services", "s3",
                   "--out", out, "--expectations", str(rules_file),
                   "--strict-expectations"])
    assert rc == 1
    assert "ERROR" in capsys.readouterr().out
    import os
    assert not os.path.exists(f"{out}/resources")

    rc = cli.main(["scan", "--provider", "aws", "--services", "s3",
                   "--out", out, "--expectations", str(rules_file)])
    assert rc == 0
    assert "WARNINGS" in capsys.readouterr().out


def test_query_and_kql_warehouse_flag(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    from corkscrew_spark import cli, skipping

    path = str(tmp_path / "wtbl")
    spark.range(200).select(F.col("id").alias("k")).repartitionByRange(
        4, "k").write.parquet(path)
    skipping.compute_stats(spark, path, ["k"])
    assert cli.main(["query", "SELECT COUNT(*) AS n FROM wt WHERE k >= 150",
                     "--warehouse", f"wt={path}", "--format", "csv"]) == 0
    out = capsys.readouterr().out
    assert out.splitlines()[1] == "50"
    assert cli.main(["kql", "wt | where k >= 150 | count",
                     "--warehouse", f"wt={path}", "--format", "csv"]) == 0
    assert capsys.readouterr().out.splitlines()[1] == "50"
    assert cli.main(["query", "SELECT 1", "--warehouse", "nopath"]) == 2


def test_query_max_scan_mb_governor(spark, tmp_path, capsys):
    """--max-scan-mb refuses a query whose metadata-only estimate
    exceeds the budget (exit 2, error mentions the budget); a
    selective query under the budget runs."""
    from pyspark.sql import functions as F

    from corkscrew_spark import cli, skipping

    path = str(tmp_path / "wtbl")
    spark.range(200_000).select(
        F.col("id").alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad")
    ).repartitionByRange(8, "k").write.parquet(path)  # multi-MB table
    skipping.compute_stats(spark, path, ["k"])
    assert cli.main(
        ["query", "SELECT COUNT(*) AS n FROM wt WHERE k >= 199000",
         "--warehouse", f"wt={path}", "--format", "csv",
         "--max-scan-mb", "2"]) == 0
    assert capsys.readouterr().out.splitlines()[1] == "1000"
    assert cli.main(
        ["query", "SELECT COUNT(*) AS n FROM wt WHERE k >= 0",
         "--warehouse", f"wt={path}", "--format", "csv",
         "--max-scan-mb", "2"]) == 2
    assert "budget" in capsys.readouterr().err


def test_kql_max_scan_mb_governor(spark, tmp_path, capsys):
    """The kql verb carries the same admission control as query/serve
    (round-7 review finding: the dashboard-facing surface was the one
    the governor didn't guard): a selective pipeline under --max-scan-mb
    runs, a wide one is refused with exit 2 before any file opens."""
    from pyspark.sql import functions as F

    from corkscrew_spark import cli, skipping

    path = str(tmp_path / "ktbl")
    spark.range(200_000).select(
        F.col("id").alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad")
    ).repartitionByRange(8, "k").write.parquet(path)  # multi-MB table
    skipping.compute_stats(spark, path, ["k"])
    assert cli.main(
        ["kql", "wt | where k >= 199000 | count",
         "--warehouse", f"wt={path}", "--format", "csv",
         "--max-scan-mb", "2"]) == 0
    assert capsys.readouterr().out.splitlines()[1] == "1000"
    assert cli.main(
        ["kql", "wt | where k >= 0 | count",
         "--warehouse", f"wt={path}", "--format", "csv",
         "--max-scan-mb", "2"]) == 2
    assert "budget" in capsys.readouterr().err
    # the bare full-table pipeline is refused too
    assert cli.main(
        ["kql", "wt | count", "--warehouse", f"wt={path}",
         "--max-scan-mb", "2"]) == 2
    assert "budget" in capsys.readouterr().err
    # --estimate is the dry-run half, same rendering as the query verb
    assert cli.main(
        ["kql", "wt | where k >= 199000 | count",
         "--warehouse", f"wt={path}", "--estimate"]) == 0
    assert "wt: 1/8 files" in capsys.readouterr().out
    assert cli.main(
        ["kql", "wt | count", "--warehouse", f"wt={path}",
         "--estimate"]) == 0
    assert "wt: 8/8 files" in capsys.readouterr().out


def test_stats_bloom_bits_auto(spark, tmp_path, capsys):
    """--bloom-bits auto sizes the bitmaps from the table's rows-per-
    file so dense files keep their FP target; explicit numbers pass
    through."""
    import base64
    import json

    from pyspark.sql import functions as F

    from corkscrew_spark import cli

    tbl = str(tmp_path / "t")
    spark.range(20_000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("d"), F.col("id")).alias("doc")
    ).repartitionByRange(4, "k").write.parquet(tbl)  # 5k keys/file
    assert cli.main(["maintenance", "stats", tbl, "--cols", "k",
                     "--bloom-cols", "doc", "--bloom-bits", "auto"]) == 0
    capsys.readouterr()
    with open(tbl + "/_column_stats.json") as fh:
        stats = json.load(fh)
    m = stats["bloom"]["m"]
    assert m >= 9 * 5_000  # ~10 bits/key, not the saturating 8192
    rec = next(iter(stats["files"].values()))
    assert len(base64.b64decode(rec["bloom"]["doc"])) * 8 == m
    # explicit number passes through
    assert cli.main(["maintenance", "stats", tbl, "--cols", "k",
                     "--bloom-cols", "doc", "--bloom-bits", "16384"]) == 0
    with open(tbl + "/_column_stats.json") as fh:
        assert json.load(fh)["bloom"]["m"] == 16384


def test_query_estimate_flag(spark, tmp_path, capsys):
    """query --estimate prints the metadata-only scan preview instead
    of executing — the admission loop's dry-run half."""
    from pyspark.sql import functions as F

    from corkscrew_spark import cli, skipping

    path = str(tmp_path / "wtbl")
    spark.range(800).select(F.col("id").alias("k")).repartitionByRange(
        8, "k").write.parquet(path)
    skipping.compute_stats(spark, path, ["k"])
    assert cli.main(["query", "SELECT * FROM wt WHERE k >= 700",
                     "--warehouse", f"wt={path}", "--estimate"]) == 0
    out = capsys.readouterr().out
    assert "wt: 1/8 files" in out
    assert cli.main(["query", "SELECT * FROM wt WHERE k < 50 OR k >= 750",
                     "--warehouse", f"wt={path}", "--estimate"]) == 0
    out = capsys.readouterr().out
    assert "2/8 files" in out and "union bound" in out
    # a bare scan previews as the full scan the governor enforces on
    assert cli.main(["query", "SELECT COUNT(*) FROM wt",
                     "--warehouse", f"wt={path}", "--estimate"]) == 0
    assert "wt: 8/8 files" in capsys.readouterr().out
    # a self-join previews its (deduplicated) full scan
    assert cli.main(["query",
                     "SELECT COUNT(*) FROM wt a JOIN wt b ON a.k = b.k",
                     "--warehouse", f"wt={path}", "--estimate"]) == 0
    assert "wt: 8/8 files" in capsys.readouterr().out
    # r10: RIGHT/FULL/comma shapes preview their bare full scans too
    # (they are governed now — r9 verdict item 1)
    assert cli.main(["query",
                     "SELECT COUNT(*) FROM wt a RIGHT JOIN wt b "
                     "ON a.k = b.k",
                     "--warehouse", f"wt={path}", "--estimate"]) == 0
    assert "wt: 8/8 files" in capsys.readouterr().out
    # only a statement referencing no warehouse table has nothing
    # to preview
    assert cli.main(["query", "SELECT * FROM VALUES (1) t(x)",
                     "--warehouse", f"wt={path}", "--estimate"]) == 0
    assert "no estimable" in capsys.readouterr().out


def test_maintenance_vstats_verb(spark, tmp_path, capsys):
    from corkscrew_spark import cli, versioned

    p = str(tmp_path / "vt")
    versioned.write_version(
        spark.createDataFrame([(1, "eu", 1), (2, "us", 1)],
                              "k long, region string, ts long"),
        p, partition_cols=["region"])
    assert cli.main(["maintenance", "vstats", p, "--cols", "k"]) == 0
    out = capsys.readouterr().out
    assert "v=1/data" in out and "zone maps" in out
    assert cli.main(["maintenance", "vstats", p]) == 2  # --cols required


def test_stats_bloom_bits_validation(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    from corkscrew_spark import cli

    tbl = str(tmp_path / "t")
    spark.range(10).select(F.col("id").alias("k")).write.parquet(tbl)
    for bad in ("8k", "0", "-8", "100"):
        assert cli.main(["maintenance", "stats", tbl, "--cols", "k",
                         "--bloom-cols", "k", "--bloom-bits", bad]) == 2
        assert "error" in capsys.readouterr().err
    # --bloom-bits without --bloom-cols: unused value, refuse loudly
    assert cli.main(["maintenance", "stats", tbl, "--cols", "k",
                     "--bloom-bits", "auto"]) == 2
    assert "requires --bloom-cols" in capsys.readouterr().err


def test_kql_externaldata_root_flag(tmp_path, capsys):
    """r12: --externaldata-root allow-lists local paths for the
    `externaldata` head; without it the verb refuses (exit 2)."""
    csv = tmp_path / "dim.csv"
    csv.write_text("code,w\nA,1\nB,2\n")
    q = (f"externaldata (code:string, w:long) ['{csv}'] "
         "with (format='csv', ignoreFirstRecord=true) "
         "| summarize n = count()")
    rc = cli.main(["kql", q, "--data", "/root/testdata/sf0.001",
                   "--format", "csv",
                   "--externaldata-root", str(tmp_path)])
    assert rc == 0
    assert capsys.readouterr().out.splitlines()[1] == "2"
    rc = cli.main(["kql", q, "--data", "/root/testdata/sf0.001"])
    assert rc == 2
    assert "externaldata is disabled" in capsys.readouterr().err
