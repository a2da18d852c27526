"""Compliance query packs: YAML manifest + one SQL file per control.

Format parity with the reference (pkg/query/compliance/pack.go:15-105):

    manifest.yaml:
      metadata: {namespace, name, version, description}
      parameters:
        - {name, type, default, required, allowed_values, pattern}
      dependencies: [other/namespace]
      queries:
        - {id, name, description, severity, file, tags}

Loader parity (loader.go:19-20,136-156,217-246): ordered search paths +
packaged defaults, SQL file loading, dependency resolution with
circular-dependency detection.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

import yaml

#: packaged default packs (the go:embed equivalent)
BUILTIN_PACK_ROOT = os.path.join(os.path.dirname(__file__), "packs")
#: verbatim reference pack assets (DuckDB dialect) — exercised through the
#: dialect shim; see packs_duckdb/README.md
REFERENCE_PACK_ROOT = os.path.join(os.path.dirname(__file__), "packs_duckdb")


class PackError(ValueError):
    pass


@dataclass
class PackParameter:
    name: str
    type: str = "string"
    default: object = None
    required: bool = False
    allowed_values: list | None = None
    pattern: str | None = None
    description: str = ""

    def validate(self, value: object) -> object:
        """Default/enum/regex validation (pack.go:567-705)."""
        if value is None:
            if self.required and self.default is None:
                raise PackError(f"missing required parameter: {self.name}")
            value = self.default
        if value is None:
            return None
        if self.type == "list" and isinstance(value, str):
            value = [v.strip() for v in value.split(",") if v.strip()]
        if self.type == "int":
            value = int(value)
        if self.type == "float":
            value = float(value)
        if self.allowed_values is not None:
            probe = value if isinstance(value, list) else [value]
            bad = [v for v in probe if v not in self.allowed_values]
            if bad:
                raise PackError(
                    f"parameter {self.name}: {bad} not in allowed values {self.allowed_values}"
                )
        if self.pattern is not None and isinstance(value, str):
            if not re.fullmatch(self.pattern, value):
                raise PackError(f"parameter {self.name}: {value!r} fails pattern {self.pattern}")
        return value


@dataclass
class ComplianceQuery:
    id: str
    name: str
    sql: str
    description: str = ""
    severity: str = "MEDIUM"
    tags: list[str] = field(default_factory=list)
    remediation: str = ""


@dataclass
class QueryPack:
    namespace: str
    name: str
    version: str
    description: str = ""
    parameters: list[PackParameter] = field(default_factory=list)
    queries: list[ComplianceQuery] = field(default_factory=list)
    dependencies: list[str] = field(default_factory=list)
    #: dependencies with required: false — skipped when unresolvable
    optional_dependencies: list[str] = field(default_factory=list)
    #: "spark" (native) or "duckdb" (reference-format pack: SQL routed
    #: through the dialect shim, metadata-filled contract columns)
    dialect: str = "spark"
    provider: str = ""
    resources: list[str] = field(default_factory=list)

    def validate_params(self, supplied: dict[str, object] | None) -> dict[str, object]:
        supplied = dict(supplied or {})
        known = {p.name for p in self.parameters}
        unknown = set(supplied) - known
        if unknown:
            raise PackError(f"unknown parameters: {sorted(unknown)}")
        return {p.name: p.validate(supplied.get(p.name)) for p in self.parameters}


#: PackParameter fields accepted from manifests (extra keys — validation
#: blocks, examples — are metadata for humans, dropped on load)
_PARAM_FIELDS = {"name", "type", "default", "required", "allowed_values", "pattern",
                 "description"}


def _load_reference_pack(path: str, doc: dict) -> QueryPack:
    """Parse the reference's own manifest format (apiVersion/kind/spec —
    pkg/query/compliance/packs/cfi/ccc-storage/manifest.yaml): parameters
    and queries under ``spec``, per-query ``query_file``/``title``/
    ``remediation``, structured ``depends_on`` entries with a
    ``required`` flag. ``includes`` are not resolved (the reference's
    shipped includes don't exist in its tree either). Packs loaded this
    way are marked dialect="duckdb" so the executor routes their SQL
    through the DuckDB→Spark shim."""
    meta = doc.get("metadata", {})
    spec = doc.get("spec", {})
    params = [
        PackParameter(**{k: v for k, v in p.items() if k in _PARAM_FIELDS})
        for p in spec.get("parameters", [])
    ]
    queries = []
    for q in spec.get("queries", []):
        if not q.get("enabled", True):
            continue
        sql_path = os.path.join(path, q.get("query_file", ""))
        if not os.path.exists(sql_path):
            raise PackError(f"query file missing: {sql_path}")
        with open(sql_path) as fh:
            sql = fh.read()
        queries.append(
            ComplianceQuery(
                id=q["id"],
                name=q.get("title", q["id"]),
                sql=sql,
                description=str(q.get("description", "")),
                severity=q.get("severity", "MEDIUM"),
                tags=list(q.get("tags", [])),
                remediation=str((q.get("remediation") or {}).get("description", "")),
            )
        )
    base_ns = meta.get("namespace", "")
    required_deps, optional_deps = [], []
    for dep in spec.get("depends_on", []):
        ns = f"{dep.get('namespace', base_ns)}/{dep['name']}"
        (required_deps if dep.get("required", True) else optional_deps).append(ns)
    return QueryPack(
        namespace=f"{base_ns}/{meta['name']}" if base_ns else meta["name"],
        name=meta.get("name", os.path.basename(path)),
        version=str(meta.get("version", "0.0.0")),
        description=meta.get("description", ""),
        parameters=params,
        queries=queries,
        dependencies=required_deps,
        optional_dependencies=optional_deps,
        dialect="duckdb",
        provider=meta.get("provider", ""),
        resources=list(meta.get("resources", [])),
    )


def load_pack(path: str) -> QueryPack:
    manifest_path = os.path.join(path, "manifest.yaml")
    if not os.path.exists(manifest_path):
        raise PackError(f"no manifest.yaml under {path}")
    with open(manifest_path) as fh:
        doc = yaml.safe_load(fh) or {}
    if doc.get("kind") == "QueryPack" or "apiVersion" in doc:
        return _load_reference_pack(path, doc)
    meta = doc.get("metadata", {})
    params = [PackParameter(**p) for p in doc.get("parameters", [])]
    queries = []
    for q in doc.get("queries", []):
        sql_path = os.path.join(path, q.get("file", os.path.join("queries", q["id"] + ".sql")))
        if not os.path.exists(sql_path):
            raise PackError(f"query file missing: {sql_path}")
        with open(sql_path) as fh:
            sql = fh.read()
        queries.append(
            ComplianceQuery(
                id=q["id"],
                name=q.get("name", q["id"]),
                sql=sql,
                description=q.get("description", ""),
                severity=q.get("severity", "MEDIUM"),
                tags=list(q.get("tags", [])),
            )
        )
    return QueryPack(
        namespace=meta.get("namespace", os.path.basename(os.path.dirname(path)) + "/" + os.path.basename(path)),
        name=meta.get("name", os.path.basename(path)),
        version=str(meta.get("version", "0.0.0")),
        description=meta.get("description", ""),
        parameters=params,
        queries=queries,
        dependencies=list(doc.get("dependencies", [])),
    )


class PackLoader:
    """Namespace-addressed pack resolution over ordered search paths."""

    def __init__(self, search_paths: list[str] | None = None):
        self.search_paths = list(search_paths or []) + [BUILTIN_PACK_ROOT, REFERENCE_PACK_ROOT]

    def discover(self) -> list[str]:
        found = []
        for root in self.search_paths:
            if not os.path.isdir(root):
                continue
            for dirpath, _dirnames, filenames in os.walk(root):
                if "manifest.yaml" in filenames:
                    found.append(os.path.relpath(dirpath, root).replace(os.sep, "/"))
        return sorted(set(found))

    def load(self, namespace: str) -> QueryPack:
        for root in self.search_paths:
            candidate = os.path.join(root, *namespace.split("/"))
            if os.path.exists(os.path.join(candidate, "manifest.yaml")):
                return load_pack(candidate)
        raise PackError(f"pack not found: {namespace} (searched {self.search_paths})")

    def load_with_dependencies(self, namespace: str) -> list[QueryPack]:
        """Dependency-ordered load with circular detection (pack.go:428-445)."""
        order: list[QueryPack] = []
        seen: dict[str, str] = {}

        def visit(ns: str) -> None:
            state = seen.get(ns)
            if state == "done":
                return
            if state == "visiting":
                raise PackError(f"circular pack dependency involving {ns}")
            seen[ns] = "visiting"
            try:
                pack = self.load(ns)
                for dep in pack.dependencies:
                    visit(dep)
                for dep in pack.optional_dependencies:
                    try:
                        visit(dep)
                    except PackError as ex:
                        if "circular" in str(ex):
                            raise
                        # optional (required: false) and unresolvable — skip
            except PackError:
                del seen[ns]  # don't leave "visiting" behind a caught failure
                raise
            seen[ns] = "done"
            order.append(pack)

        visit(namespace)
        return order
