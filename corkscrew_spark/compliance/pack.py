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


@dataclass
class QueryPack:
    namespace: str
    name: str
    version: str
    description: str = ""
    parameters: list[PackParameter] = field(default_factory=list)
    queries: list[ComplianceQuery] = field(default_factory=list)
    dependencies: list[str] = field(default_factory=list)

    def validate_params(self, supplied: dict[str, object] | None) -> dict[str, object]:
        supplied = dict(supplied or {})
        known = {p.name for p in self.parameters}
        unknown = set(supplied) - known
        if unknown:
            raise PackError(f"unknown parameters: {sorted(unknown)}")
        return {p.name: p.validate(supplied.get(p.name)) for p in self.parameters}


def load_pack(path: str) -> QueryPack:
    manifest_path = os.path.join(path, "manifest.yaml")
    if not os.path.exists(manifest_path):
        raise PackError(f"no manifest.yaml under {path}")
    with open(manifest_path) as fh:
        doc = yaml.safe_load(fh) or {}
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
        self.search_paths = list(search_paths or []) + [BUILTIN_PACK_ROOT]

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
            pack = self.load(ns)
            for dep in pack.dependencies:
                visit(dep)
            seen[ns] = "done"
            order.append(pack)

        visit(namespace)
        return order
