"""Pack registry client: search / install / version resolution.

Parity: pkg/query/compliance/registry.go — registry cache + SearchPacks
criteria matching (:564-668), version listing ordered newest-first
(:513-562, :715-716 "latest"), DownloadPack into an install dir (:700-742);
cmd/corkscrew/pack.go — install flow with dependency handling (:256-391)
and installed-pack listing (:513-563).

Transport: the reference pulls from GitHub releases over HTTP. That is
credential/network-bound, so (like the boto3 scan path) the wire protocol
here is a REGISTRY DIRECTORY — a local/mounted tree:

    <registry root>/<namespace...>/<version>/manifest.yaml + queries/

which is exactly the layout the reference's tarballs extract to. Every
registry behavior above the transport — criteria search, semver ordering
and constraint resolution, latest-version selection, dependency-chasing
install, already-installed/force handling — is implemented faithfully and
unit-tested offline.

Version constraints support the forms the reference's manifests use
(depends_on: version: ">=1.0.0") plus the usual semver operators:
exact, =, ==, >=, >, <=, <, ^x.y.z (same major), ~x.y.z (same minor).
"""

from __future__ import annotations

import os
import re
import shutil
from dataclasses import dataclass, field

import yaml

from corkscrew_spark.compliance.pack import PackError, load_pack

_SEMVER_RE = re.compile(
    r"^v?(\d+)(?:\.(\d+))?(?:\.(\d+))?(?:-([0-9A-Za-z.-]+))?(?:\+[0-9A-Za-z.-]+)?$"
)


def parse_semver(s: str) -> tuple:
    """Parse into an orderable key ((major, minor, patch), release-rank,
    prerelease-ids). A release outranks any prerelease of the same
    triple; prerelease identifiers compare numerically when numeric,
    lexically otherwise (semver.org §11)."""
    m = _SEMVER_RE.match(s.strip())
    if not m:
        raise PackError(f"not a semver version: {s!r}")
    nums = tuple(int(m.group(i) or 0) for i in (1, 2, 3))
    pre = m.group(4)
    if pre is None:
        return (nums, 1, ())
    ids = tuple(
        (0, int(p), "") if p.isdigit() else (1, 0, p) for p in pre.split(".")
    )
    return (nums, 0, ids)


def semver_match(version: str, constraint: str | None) -> bool:
    """True when ``version`` satisfies ``constraint``."""
    if not constraint or constraint in ("*", "latest"):
        return True
    constraint = constraint.strip()
    m = re.match(r"^(>=|<=|==|=|>|<|\^|~)?\s*(.+)$", constraint)
    op, target = m.group(1) or "==", m.group(2)
    v, t = parse_semver(version), parse_semver(target)
    if op in ("=", "=="):
        return v == t
    if op == ">=":
        return v >= t
    if op == ">":
        return v > t
    if op == "<=":
        return v <= t
    if op == "<":
        return v < t
    vt, tt = v[0], t[0]
    if op == "^":  # same major, at least target
        return vt[0] == tt[0] and v >= t
    if op == "~":  # same major.minor, at least target
        return vt[:2] == tt[:2] and v >= t
    raise PackError(f"unsupported version constraint: {constraint!r}")


@dataclass
class PackInfo:
    namespace: str
    name: str
    description: str = ""
    provider: str = ""
    frameworks: list[str] = field(default_factory=list)
    categories: list[str] = field(default_factory=list)
    tags: list[str] = field(default_factory=list)
    #: available versions, newest first (registry.go:431 latest == [0])
    versions: list[str] = field(default_factory=list)

    @property
    def latest_version(self) -> str:
        return self.versions[0] if self.versions else ""


@dataclass
class SearchResult:
    packs: list[PackInfo]
    total: int
    limit: int = 0
    offset: int = 0
    query: str = ""


def _read_manifest_meta(pack_dir: str) -> dict:
    with open(os.path.join(pack_dir, "manifest.yaml")) as fh:
        doc = yaml.safe_load(fh) or {}
    meta = dict(doc.get("metadata", {}))
    labels = meta.get("labels", {}) or {}
    meta.setdefault("categories", [labels["category"]] if "category" in labels else [])
    return meta


class RegistryClient:
    def __init__(self, registry_root: str):
        self.registry_root = registry_root
        self._cache: dict[str, PackInfo] | None = None

    # -- cache ---------------------------------------------------------------

    def update_registry(self, force_refresh: bool = False) -> None:
        """Scan the registry tree into the pack cache (UpdateRegistry)."""
        if self._cache is not None and not force_refresh:
            return
        cache: dict[str, PackInfo] = {}
        root = self.registry_root
        if not os.path.isdir(root):
            self._cache = cache
            return
        for dirpath, _dirnames, filenames in os.walk(root):
            if "manifest.yaml" not in filenames:
                continue
            version_dir = os.path.relpath(dirpath, root).replace(os.sep, "/")
            ns, _, version = version_dir.rpartition("/")
            try:
                parse_semver(version)
            except PackError:
                continue  # not a <namespace>/<version> leaf
            meta = _read_manifest_meta(dirpath)
            info = cache.get(ns)
            if info is None:
                info = cache[ns] = PackInfo(
                    namespace=ns,
                    name=str(meta.get("name", ns.rsplit("/", 1)[-1])),
                    description=str(meta.get("description", "")),
                    provider=str(meta.get("provider", "")),
                    frameworks=list(meta.get("frameworks", [])),
                    categories=list(meta.get("categories", [])),
                    tags=list(meta.get("tags", [])),
                )
            info.versions.append(version)
        for info in cache.values():
            info.versions.sort(key=parse_semver, reverse=True)
        self._cache = cache

    # -- search --------------------------------------------------------------

    def search(self, query: str = "", provider: str = "", framework: str = "",
               category: str = "", namespace: str = "",
               tags: list[str] | None = None, sort: str = "name",
               order: str = "asc", limit: int = 0, offset: int = 0) -> SearchResult:
        """Criteria search over the registry cache (SearchPacks,
        matchesCriteria registry.go:626-668)."""
        self.update_registry()
        matches = [
            p for p in self._cache.values()
            if self._matches(p, query, provider, framework, category, namespace,
                             tags or [])
        ]
        key = {
            "name": lambda p: p.name.lower(),
            "namespace": lambda p: p.namespace,
            "provider": lambda p: p.provider,
            "version": lambda p: parse_semver(p.latest_version or "0.0.0"),
        }.get(sort or "name", lambda p: p.name.lower())
        matches.sort(key=key, reverse=(order == "desc"))
        total = len(matches)
        if limit > 0:
            matches = matches[offset:offset + limit]
        return SearchResult(packs=matches, total=total, limit=limit,
                            offset=offset, query=query)

    @staticmethod
    def _matches(p: PackInfo, query: str, provider: str, framework: str,
                 category: str, namespace: str, tags: list[str]) -> bool:
        if query:
            q = query.lower()
            if (q not in p.name.lower() and q not in p.description.lower()
                    and not any(q in t.lower() for t in p.tags)):
                return False
        if provider and p.provider != provider:
            return False
        if framework and framework not in p.frameworks:
            return False
        if category and category not in p.categories:
            return False
        if namespace and not p.namespace.startswith(namespace):
            return False
        return all(t in p.tags for t in tags)

    # -- install -------------------------------------------------------------

    def resolve_version(self, namespace: str, want: str = "latest") -> str:
        """'latest', an exact version, or a constraint → concrete version
        (newest satisfying one; registry.go:715-716)."""
        self.update_registry()
        info = self._cache.get(namespace)
        if info is None or not info.versions:
            raise PackError(f"pack not in registry: {namespace}")
        for v in info.versions:  # newest first
            if semver_match(v, want):
                return v
        raise PackError(
            f"{namespace}: no version satisfies {want!r} "
            f"(available: {', '.join(info.versions)})"
        )

    def install(self, namespace: str, dest_dir: str, version: str = "latest",
                force: bool = False, deps: bool = True,
                dry_run: bool = False) -> list[tuple[str, str]]:
        """Install a pack (and, by default, its dependency chain) into
        ``dest_dir`` using the loader's ``<dest>/<namespace>`` layout.
        Returns [(namespace, version)] actually installed, target first.
        Already-installed packs are skipped unless ``force``
        (runPackInstall pack.go:256-340)."""
        resolved = self.resolve_version(namespace, version)
        plan: list[tuple[str, str]] = [(namespace, resolved)]
        installed: list[tuple[str, str]] = []
        seen = {namespace}
        while plan:
            ns, ver = plan.pop(0)
            src = os.path.join(self.registry_root, *ns.split("/"), ver)
            dst = os.path.join(dest_dir, *ns.split("/"))
            if os.path.exists(os.path.join(dst, "manifest.yaml")) and not force:
                continue
            if not dry_run:
                if os.path.isdir(dst):
                    shutil.rmtree(dst)
                shutil.copytree(src, dst)
            installed.append((ns, ver))
            if not deps:
                continue
            pack = load_pack(src)
            for dep in pack.dependencies + pack.optional_dependencies:
                if dep in seen:
                    continue
                seen.add(dep)
                try:
                    plan.append((dep, self.resolve_version(dep)))
                except PackError:
                    if dep in pack.dependencies:
                        raise  # required dependency missing from registry
        return installed


def installed_packs(install_dir: str) -> list[dict[str, object]]:
    """Enumerate installed packs with their metadata (runPackList)."""
    out: list[dict[str, object]] = []
    if not os.path.isdir(install_dir):
        return out
    for dirpath, _dirnames, filenames in os.walk(install_dir):
        if "manifest.yaml" not in filenames:
            continue
        pack = load_pack(dirpath)
        out.append({
            "namespace": os.path.relpath(dirpath, install_dir).replace(os.sep, "/"),
            "name": pack.name,
            "version": pack.version,
            "queries": len(pack.queries),
            "dialect": pack.dialect,
        })
    return sorted(out, key=lambda d: d["namespace"])
