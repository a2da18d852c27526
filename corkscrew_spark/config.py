"""Service configuration — parity with the reference's config subsystem.

Mirrors ``internal/config/service_config.go``: a ``corkscrew.yaml`` with
per-provider discovery mode (manual/auto/hybrid), include/exclude service
lists, named service groups, and analysis knobs; load priority env >
file > defaults (``LoadServiceConfig``, :38-60); standard file locations
incl. ``CORKSCREW_CONFIG_FILE`` (:62-85); env overrides
``CORKSCREW_AWS_SERVICES`` / ``CORKSCREW_DISCOVERY_MODE`` (:125-146);
service resolution with mode + exclusions (``GetServicesForProvider``,
:148-200); validation of modes/workers (:216-240).

"auto" discovery here resolves from the offline provider catalogs
(aws_scanner.LIST_OPERATIONS etc.) instead of the Go SDK's go.mod scan —
same contract (the services the engine can actually scan), Spark-era
source of truth.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import yaml

_DEFAULT_LOCATIONS = [
    "corkscrew.yaml",
    "corkscrew.yml",
    ".corkscrew.yaml",
    ".corkscrew.yml",
]

_VALID_MODES = {"manual", "auto", "hybrid"}


class ConfigError(ValueError):
    pass


@dataclass
class AnalysisConfig:
    skip_empty: bool = True
    workers: int = 4
    cache_enabled: bool = True
    cache_ttl: str = "24h"


@dataclass
class ProviderConfig:
    discovery_mode: str = "manual"
    include: list[str] = field(default_factory=list)
    exclude: list[str] = field(default_factory=list)
    service_groups: dict[str, list[str]] = field(default_factory=dict)
    analysis: AnalysisConfig = field(default_factory=AnalysisConfig)


@dataclass
class ServiceConfig:
    version: str = "1.0"
    providers: dict[str, ProviderConfig] = field(default_factory=dict)

    # -- resolution ----------------------------------------------------------
    def services_for_provider(self, provider: str) -> list[str]:
        """Final service list: mode-dependent base set minus exclusions
        (reference GetServicesForProvider semantics; sorted for
        deterministic output)."""
        prov = self.providers.get(provider)
        if prov is None:
            raise ConfigError(f"provider {provider} not configured")
        services: set[str] = set()
        if prov.discovery_mode in ("manual", "hybrid"):
            services.update(prov.include)
        if prov.discovery_mode in ("auto", "hybrid"):
            services.update(_discover_services(provider))
        services.difference_update(prov.exclude)
        return sorted(services)

    def service_group(self, provider: str, group: str) -> list[str]:
        prov = self.providers.get(provider)
        if prov is None:
            raise ConfigError(f"provider {provider} not configured")
        if group not in prov.service_groups:
            raise ConfigError(f"service group {group} not found")
        return list(prov.service_groups[group])

    def to_dict(self) -> dict[str, Any]:
        return {
            "version": self.version,
            "providers": {
                name: {
                    "discovery_mode": p.discovery_mode,
                    "services": {"include": p.include, "exclude": p.exclude},
                    "service_groups": p.service_groups,
                    "analysis": {
                        "skip_empty": p.analysis.skip_empty,
                        "workers": p.analysis.workers,
                        "cache_enabled": p.analysis.cache_enabled,
                        "cache_ttl": p.analysis.cache_ttl,
                    },
                }
                for name, p in self.providers.items()
            },
        }


def _discover_services(provider: str) -> list[str]:
    """Auto-discovery from the offline provider catalogs — the set the
    scanners can actually list."""
    if provider == "aws":
        from corkscrew_spark.ingest.aws_scanner import LIST_OPERATIONS

        return sorted(LIST_OPERATIONS)
    if provider == "kubernetes":
        from corkscrew_spark.ingest.k8s_scanner import KNOWN_GVRS

        return sorted({g.split("/")[-1] for g in KNOWN_GVRS})
    if provider in ("azure", "gcp"):
        from corkscrew_spark.ingest.cloud_sources import _AZ_TYPES, _GCP_TYPES

        types = _AZ_TYPES if provider == "azure" else _GCP_TYPES
        return sorted({service for _, service in types})
    return []


def default_config() -> ServiceConfig:
    """Reference getDefaultConfig (:100-123): manual AWS with the
    standard 18-service include list."""
    return ServiceConfig(
        providers={
            "aws": ProviderConfig(
                discovery_mode="manual",
                include=[
                    "ec2", "s3", "lambda", "rds", "dynamodb", "iam",
                    "sqs", "sns", "ecs", "eks", "cloudformation",
                    "cloudwatch", "route53", "elasticloadbalancing",
                    "autoscaling", "kms", "secretsmanager", "ssm",
                ],
            )
        }
    )


def _config_path(cwd: str | Path = ".") -> Path | None:
    env = os.environ.get("CORKSCREW_CONFIG_FILE")
    if env:
        return Path(env)
    home = Path(os.environ.get("HOME", "/"))
    candidates = [Path(cwd) / n for n in _DEFAULT_LOCATIONS]
    ws = os.environ.get("CORKSCREW_HOME")
    if ws:  # `cli init` seeds its config here
        candidates.append(Path(ws) / "config.yaml")
    candidates.append(home / ".corkscrew" / "config.yaml")
    for loc in candidates:
        if loc.exists():
            return loc
    return None


def _parse(doc: dict[str, Any]) -> ServiceConfig:
    providers: dict[str, ProviderConfig] = {}
    for name, p in (doc.get("providers") or {}).items():
        services = p.get("services") or {}
        analysis = p.get("analysis") or {}
        providers[name] = ProviderConfig(
            discovery_mode=p.get("discovery_mode", "manual"),
            include=list(services.get("include") or []),
            exclude=list(services.get("exclude") or []),
            service_groups={k: list(v) for k, v in
                            (p.get("service_groups") or {}).items()},
            analysis=AnalysisConfig(
                skip_empty=bool(analysis.get("skip_empty", True)),
                workers=int(analysis.get("workers", 4)),
                cache_enabled=bool(analysis.get("cache_enabled", True)),
                cache_ttl=str(analysis.get("cache_ttl", "24h")),
            ),
        )
    return ServiceConfig(version=str(doc.get("version") or "1.0"),
                         providers=providers)


def validate(cfg: ServiceConfig) -> None:
    """Reference validateConfig (:216-240): modes must be known, workers
    positive (defaulted rather than fatal in the reference — we default
    too, erroring only on nonsense)."""
    for name, prov in cfg.providers.items():
        if prov.discovery_mode not in _VALID_MODES:
            raise ConfigError(
                f"invalid discovery mode '{prov.discovery_mode}' "
                f"for provider {name}")
        if prov.analysis.workers <= 0:
            prov.analysis.workers = 4
        for group, svcs in prov.service_groups.items():
            if not isinstance(svcs, list):
                raise ConfigError(f"service group {group} must be a list")


def load_config(cwd: str | Path = ".") -> ServiceConfig:
    """env > file > defaults, then env overrides, then validation."""
    path = _config_path(cwd)
    if path is None:
        cfg = default_config()
    else:
        with open(path) as f:
            doc = yaml.safe_load(f) or {}
        cfg = _parse(doc)
    # env overrides (reference applyEnvOverrides)
    services = os.environ.get("CORKSCREW_AWS_SERVICES")
    if services and "aws" in cfg.providers:
        cfg.providers["aws"].include = [
            s.strip() for s in services.split(",") if s.strip()]
    mode = os.environ.get("CORKSCREW_DISCOVERY_MODE")
    if mode and "aws" in cfg.providers:
        cfg.providers["aws"].discovery_mode = mode
    validate(cfg)
    return cfg


def init_config_file(path: str | Path = "corkscrew.yaml") -> Path:
    """Write the default config; refuses to clobber an existing file."""
    p = Path(path)
    if p.exists():
        raise ConfigError(f"{p} already exists")
    p.write_text(yaml.safe_dump(default_config().to_dict(), sort_keys=False))
    return p
