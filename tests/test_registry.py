"""Pack registry: semver ordering/constraints, criteria search, install
with dependency chasing, loader round-trip. File-based registry fixture —
no network (registry.go:564-742, pack.go:256-391)."""

from __future__ import annotations

import os

import pytest

from corkscrew_spark.compliance.pack import PackError, PackLoader
from corkscrew_spark.compliance.registry import (
    RegistryClient,
    installed_packs,
    parse_semver,
    semver_match,
)


# --- semver ----------------------------------------------------------------

def test_semver_ordering():
    versions = ["1.0.0", "1.0.1", "1.1.0", "2.0.0", "2.0.0-rc.1", "1.0.0-alpha"]
    ordered = sorted(versions, key=parse_semver)
    assert ordered == ["1.0.0-alpha", "1.0.0", "1.0.1", "1.1.0", "2.0.0-rc.1", "2.0.0"]


def test_semver_prerelease_ids():
    assert parse_semver("1.0.0-alpha") < parse_semver("1.0.0-alpha.1")
    assert parse_semver("1.0.0-alpha.2") < parse_semver("1.0.0-alpha.10")
    assert parse_semver("1.0.0-alpha.beta") < parse_semver("1.0.0-beta")
    assert parse_semver("v1.2.3") == parse_semver("1.2.3")
    with pytest.raises(PackError, match="not a semver"):
        parse_semver("not.a.version")


@pytest.mark.parametrize(
    ("version", "constraint", "ok"),
    [
        ("1.2.3", ">=1.0.0", True),
        ("0.9.0", ">=1.0.0", False),
        ("1.2.3", "latest", True),
        ("1.2.3", "1.2.3", True),
        ("1.2.3", "==1.2.4", False),
        ("1.9.0", "^1.2.0", True),
        ("2.0.0", "^1.2.0", False),
        ("1.2.9", "~1.2.3", True),
        ("1.3.0", "~1.2.3", False),
        ("1.2.3", "<2.0.0", True),
    ],
)
def test_semver_match(version, constraint, ok):
    assert semver_match(version, constraint) is ok


# --- registry fixture ------------------------------------------------------

def _write_pack(root, ns, version, *, provider="aws", tags=(), deps=(),
                optional_deps=(), frameworks=()):
    d = os.path.join(root, *ns.split("/"), version)
    os.makedirs(os.path.join(d, "queries"), exist_ok=True)
    dep_lines = ""
    if deps or optional_deps:
        entries = [f"    - {{name: {dep.rsplit('/', 1)[-1]}, namespace: {dep.rsplit('/', 1)[0]}, version: '>=1.0.0'}}"
                   for dep in deps]
        entries += [f"    - {{name: {dep.rsplit('/', 1)[-1]}, namespace: {dep.rsplit('/', 1)[0]}, version: '>=1.0.0', required: false}}"
                    for dep in optional_deps]
        dep_lines = "  depends_on:\n" + "\n".join(entries) + "\n"
    with open(os.path.join(d, "manifest.yaml"), "w") as fh:
        fh.write(
            "apiVersion: v1\nkind: QueryPack\n"
            "metadata:\n"
            f"  name: {ns.rsplit('/', 1)[-1]}\n"
            f"  namespace: {ns.rsplit('/', 1)[0]}\n"
            f"  version: {version}\n"
            f"  description: test pack {ns}\n"
            f"  provider: {provider}\n"
            f"  tags: [{', '.join(tags)}]\n"
            f"  frameworks: [{', '.join(frameworks)}]\n"
            "spec:\n"
            "  queries:\n"
            "    - {id: q1, title: Q1, query_file: queries/q1.sql}\n"
            + dep_lines
        )
    with open(os.path.join(d, "queries", "q1.sql"), "w") as fh:
        fh.write("SELECT 1 AS resource_id;\n")


@pytest.fixture()
def registry(tmp_path):
    root = str(tmp_path / "registry")
    _write_pack(root, "cfi/ccc/storage", "1.0.0", tags=("storage", "security"),
                frameworks=("ccc",))
    _write_pack(root, "cfi/ccc/storage", "1.2.0", tags=("storage", "security"),
                frameworks=("ccc",), deps=("cfi/ccc/common",))
    _write_pack(root, "cfi/ccc/storage", "2.0.0-rc.1", tags=("storage",))
    _write_pack(root, "cfi/ccc/common", "1.1.0", tags=("common",))
    _write_pack(root, "acme/k8s-hygiene", "0.3.0", provider="kubernetes",
                tags=("k8s",), optional_deps=("acme/missing",))
    return RegistryClient(root)


# --- search ----------------------------------------------------------------

def test_search_all_and_criteria(registry):
    assert {p.namespace for p in registry.search().packs} == {
        "cfi/ccc/storage", "cfi/ccc/common", "acme/k8s-hygiene"
    }
    assert [p.namespace for p in registry.search(provider="kubernetes").packs] == [
        "acme/k8s-hygiene"
    ]
    assert [p.namespace for p in registry.search(query="storage").packs] == [
        "cfi/ccc/storage"
    ]
    assert [p.namespace for p in registry.search(framework="ccc").packs] == [
        "cfi/ccc/storage"
    ]
    assert {p.namespace for p in registry.search(namespace="cfi/").packs} == {
        "cfi/ccc/storage", "cfi/ccc/common"
    }
    res = registry.search(limit=2, offset=1)
    assert res.total == 3 and len(res.packs) == 2


def test_versions_sorted_newest_first(registry):
    info = registry.search(query="storage").packs[0]
    assert info.versions == ["2.0.0-rc.1", "1.2.0", "1.0.0"]
    assert info.latest_version == "2.0.0-rc.1"


# --- version resolution ----------------------------------------------------

def test_resolve_version(registry):
    assert registry.resolve_version("cfi/ccc/storage") == "2.0.0-rc.1"
    assert registry.resolve_version("cfi/ccc/storage", "^1.0.0") == "1.2.0"
    assert registry.resolve_version("cfi/ccc/storage", "1.0.0") == "1.0.0"
    with pytest.raises(PackError, match="no version satisfies"):
        registry.resolve_version("cfi/ccc/storage", ">=3.0.0")
    with pytest.raises(PackError, match="not in registry"):
        registry.resolve_version("nope/nothing")


# --- install ---------------------------------------------------------------

def test_install_with_dependency_chain(registry, tmp_path):
    dest = str(tmp_path / "installed")
    done = registry.install("cfi/ccc/storage", dest, version="^1.0.0")
    # target first, then its required dependency, resolved via semver
    assert done == [("cfi/ccc/storage", "1.2.0"), ("cfi/ccc/common", "1.1.0")]
    # loader resolves the installed pack (round-trip into the executor path)
    pack = PackLoader([dest]).load("cfi/ccc/storage")
    assert pack.version == "1.2.0" and pack.dialect == "duckdb"
    chain = PackLoader([dest]).load_with_dependencies("cfi/ccc/storage")
    assert [p.namespace for p in chain] == ["cfi/ccc/common", "cfi/ccc/storage"]
    listed = installed_packs(dest)
    assert [(r["namespace"], r["version"]) for r in listed] == [
        ("cfi/ccc/common", "1.1.0"), ("cfi/ccc/storage", "1.2.0")
    ]


def test_install_skips_already_installed_unless_force(registry, tmp_path):
    dest = str(tmp_path / "installed")
    registry.install("cfi/ccc/common", dest)
    assert registry.install("cfi/ccc/common", dest) == []
    assert registry.install("cfi/ccc/common", dest, force=True) == [
        ("cfi/ccc/common", "1.1.0")
    ]


def test_install_optional_dep_missing_is_skipped(registry, tmp_path):
    dest = str(tmp_path / "installed")
    done = registry.install("acme/k8s-hygiene", dest)
    assert done == [("acme/k8s-hygiene", "0.3.0")]


def test_install_dry_run_touches_nothing(registry, tmp_path):
    dest = str(tmp_path / "installed")
    done = registry.install("cfi/ccc/storage", dest, dry_run=True)
    assert done and not os.path.exists(dest)


# --- CLI surface -----------------------------------------------------------

def test_cli_pack_search_and_install(registry, tmp_path, capsys):
    from corkscrew_spark import cli

    dest = str(tmp_path / "cli-installed")
    rc = cli.main(["pack", "search", "storage", "--registry", registry.registry_root])
    assert rc == 0
    out = capsys.readouterr().out
    assert "cfi/ccc/storage" in out and "2.0.0-rc.1" in out
    rc = cli.main(["pack", "install", "cfi/ccc/storage", "--version", "^1.0.0",
                   "--registry", registry.registry_root, "--dest", dest])
    assert rc == 0
    assert "installed cfi/ccc/storage@1.2.0" in capsys.readouterr().out
    rc = cli.main(["pack", "installed", "--dest", dest])
    assert rc == 0
    assert "cfi/ccc/storage\t1.2.0" in capsys.readouterr().out
