"""Operation cache: hit/expiry/eviction unit tests + the scanner loop
serving a re-scan from cache (operation_cache.go:22-126)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from corkscrew_spark.ingest import aws_scanner
from corkscrew_spark.ingest.operation_cache import OperationCache


class Clock:
    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t


def test_hit_and_miss_counters():
    c = OperationCache(ttl_seconds=60)
    _, ok = c.get("s3", "list_buckets", {"region": "us-east-1"})
    assert not ok
    c.set("s3", "list_buckets", {"region": "us-east-1"}, [{"page": 1}])
    val, ok = c.get("s3", "list_buckets", {"region": "us-east-1"})
    assert ok and val == [{"page": 1}]
    # different params → different key
    _, ok = c.get("s3", "list_buckets", {"region": "eu-west-1"})
    assert not ok
    assert c.stats()["hits"] == 1 and c.stats()["misses"] == 2


def test_ttl_expiry():
    clock = Clock()
    c = OperationCache(ttl_seconds=30, clock=clock)
    c.set("ec2", "describe_instances", None, ["v"])
    assert c.get("ec2", "describe_instances", None)[1]
    clock.t += 31
    assert not c.get("ec2", "describe_instances", None)[1]


def test_size_cap_evicts_oldest_first():
    clock = Clock()
    c = OperationCache(max_size_mb=300 / (1024 * 1024), clock=clock)  # 300 bytes
    for i in range(3):
        c.set("svc", f"op{i}", None, "x" * 80)  # ~86 bytes each
        clock.t += 1
    assert c.stats()["entries"] == 3
    c.set("svc", "op3", None, "x" * 80)  # overflows: evict op0 (oldest)
    assert not c.get("svc", "op0", None)[1]
    assert c.get("svc", "op1", None)[1] and c.get("svc", "op3", None)[1]
    assert c.evict_count >= 1
    assert c.current_size <= c.max_size


def test_overwrite_replaces_size():
    c = OperationCache()
    c.set("s", "o", None, "x" * 100)
    size1 = c.current_size
    c.set("s", "o", None, "x" * 10)
    assert c.current_size < size1 and c.stats()["entries"] == 1


def test_rescan_served_from_cache(monkeypatch):
    """Second pass over the same (service, region) cell within the TTL
    makes ZERO paginator calls."""
    aws_scanner._OPERATION_CACHE.clear()
    calls = {"n": 0}
    orig = aws_scanner._FakePaginator.paginate

    def counting(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(aws_scanner._FakePaginator, "paginate", counting)
    work = [Row(service="s3", region="us-east-1")]
    ts = dt.datetime(2024, 1, 1)
    first = list(aws_scanner._scan_partition(iter(work), 0.0, ts, False))
    assert calls["n"] == 1 and first
    second = list(aws_scanner._scan_partition(iter(work), 0.0, ts, False))
    assert calls["n"] == 1, "re-scan must hit the cache, not the API"
    assert [r.id for r in second] == [r.id for r in first]
    # cache disabled → the API is called again
    third = list(aws_scanner._scan_partition(iter(work), 0.0, ts, False, use_cache=False))
    assert calls["n"] == 2 and [r.id for r in third] == [r.id for r in first]
