"""Service-config subsystem tests — parity with
internal/config/service_config.go (load priority, env overrides,
discovery-mode resolution, validation) plus the config/info/version CLI
verbs."""

from __future__ import annotations

import pytest
import yaml

from corkscrew_spark import cli
from corkscrew_spark import config as cfgmod


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    for var in ("CORKSCREW_CONFIG_FILE", "CORKSCREW_AWS_SERVICES",
                "CORKSCREW_DISCOVERY_MODE"):
        monkeypatch.delenv(var, raising=False)


def test_defaults_when_no_file(tmp_path, monkeypatch):
    monkeypatch.setenv("HOME", str(tmp_path))
    cfg = cfgmod.load_config(cwd=tmp_path)
    assert cfg.providers["aws"].discovery_mode == "manual"
    services = cfg.services_for_provider("aws")
    assert "s3" in services and "ec2" in services and len(services) == 18


def test_file_load_and_exclusions(tmp_path, monkeypatch):
    monkeypatch.setenv("HOME", str(tmp_path))
    (tmp_path / "corkscrew.yaml").write_text(yaml.safe_dump({
        "version": "1.0",
        "providers": {
            "aws": {
                "discovery_mode": "manual",
                "services": {"include": ["s3", "ec2", "iam"],
                             "exclude": ["iam"]},
                "service_groups": {"storage": ["s3"]},
                "analysis": {"workers": 8},
            }
        },
    }))
    cfg = cfgmod.load_config(cwd=tmp_path)
    assert cfg.services_for_provider("aws") == ["ec2", "s3"]
    assert cfg.service_group("aws", "storage") == ["s3"]
    assert cfg.providers["aws"].analysis.workers == 8


def test_env_file_pointer_and_overrides(tmp_path, monkeypatch):
    custom = tmp_path / "elsewhere.yml"
    custom.write_text(yaml.safe_dump({
        "providers": {"aws": {"discovery_mode": "manual",
                              "services": {"include": ["rds"]}}},
    }))
    monkeypatch.setenv("HOME", str(tmp_path))
    monkeypatch.setenv("CORKSCREW_CONFIG_FILE", str(custom))
    assert cfgmod.load_config(cwd=tmp_path).services_for_provider("aws") == ["rds"]

    # env service list beats the file (applyEnvOverrides parity)
    monkeypatch.setenv("CORKSCREW_AWS_SERVICES", "s3, lambda")
    cfg = cfgmod.load_config(cwd=tmp_path)
    assert cfg.services_for_provider("aws") == ["lambda", "s3"]

    monkeypatch.setenv("CORKSCREW_DISCOVERY_MODE", "bogus")
    with pytest.raises(cfgmod.ConfigError, match="invalid discovery mode"):
        cfgmod.load_config(cwd=tmp_path)


def test_auto_and_hybrid_modes(tmp_path, monkeypatch):
    monkeypatch.setenv("HOME", str(tmp_path))
    (tmp_path / "corkscrew.yaml").write_text(yaml.safe_dump({
        "providers": {
            "aws": {"discovery_mode": "auto"},
            "k8s_like": {"discovery_mode": "manual",
                         "services": {"include": ["x"]}},
        },
    }))
    cfg = cfgmod.load_config(cwd=tmp_path)
    auto = cfg.services_for_provider("aws")
    assert "s3" in auto  # from the scanner catalog
    # hybrid = manual ∪ auto
    cfg.providers["aws"].discovery_mode = "hybrid"
    cfg.providers["aws"].include = ["not-in-catalog"]
    hybrid = cfg.services_for_provider("aws")
    assert set(auto) < set(hybrid) and "not-in-catalog" in hybrid


def test_init_refuses_clobber(tmp_path):
    p = cfgmod.init_config_file(tmp_path / "corkscrew.yaml")
    assert yaml.safe_load(p.read_text())["providers"]["aws"]
    with pytest.raises(cfgmod.ConfigError, match="exists"):
        cfgmod.init_config_file(p)


def test_unknown_provider_raises():
    with pytest.raises(cfgmod.ConfigError, match="not configured"):
        cfgmod.default_config().services_for_provider("nope")


# ---------------------------------------------------------------------------
# CLI verbs
# ---------------------------------------------------------------------------

def test_cli_config_cycle(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("HOME", str(tmp_path))
    monkeypatch.chdir(tmp_path)
    assert cli.main(["config", "init"]) == 0
    assert "created" in capsys.readouterr().out
    assert cli.main(["config", "show"]) == 0
    out = capsys.readouterr().out
    assert "discovery_mode: manual" in out and "Resolved aws services (18)" in out
    assert cli.main(["config", "validate"]) == 0
    assert "valid" in capsys.readouterr().out
    # re-init refuses
    assert cli.main(["config", "init"]) == 2


def test_cli_info_all_providers(capsys):
    import json

    for provider in ("aws", "azure", "gcp", "kubernetes"):
        assert cli.main(["info", "--provider", provider, "--output", "json"]) == 0
        doc = json.loads(capsys.readouterr().out)
        assert doc["name"] == provider and doc["supported_services"]
    assert cli.main(["info", "--provider", "aws"]) == 0
    assert "Provider:    aws" in capsys.readouterr().out
    assert cli.main(["info", "--provider", "nope"]) == 2


def test_cli_version(capsys):
    assert cli.main(["version"]) == 0
    assert "corkscrew-spark 2.0.0" in capsys.readouterr().out


def test_scan_uses_config_service_list(tmp_path, monkeypatch, capsys, spark):
    """`scan` without --services consults corkscrew.yaml (reference: scan
    resolves its service list through the config subsystem)."""
    monkeypatch.setattr("corkscrew_spark.session.get_spark", lambda **kw: spark)
    monkeypatch.setattr("corkscrew_spark.cli.get_spark", lambda **kw: spark)
    monkeypatch.setenv("HOME", str(tmp_path))
    monkeypatch.chdir(tmp_path)
    (tmp_path / "corkscrew.yaml").write_text(yaml.safe_dump({
        "providers": {"aws": {"discovery_mode": "manual",
                              "services": {"include": ["s3", "iam"]}}},
    }))
    rc = cli.main(["scan", "--provider", "aws",
                   "--out", str(tmp_path / "wh")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "resources" in out
    scanned = spark.read.parquet(str(tmp_path / "wh" / "resources"))
    assert {r["service"] for r in scanned.select("service").distinct().collect()} \
        == {"s3", "iam"}
