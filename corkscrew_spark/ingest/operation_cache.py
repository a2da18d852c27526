"""Per-executor operation cache for ingest API calls.

Parity: internal/cache/operation_cache.go:22-126 — TTL expiry, byte-size
cap with oldest-first eviction, (service, operation, params-hash) keys,
hit/miss/evict counters. The KQL result cache
(plugins/azure-provider/resource_graph.go:556-599) is the same mechanism
keyed on query text, served by the same class.

Spark placement: one cache per PYTHON WORKER PROCESS (module/global or
closure-captured per partition), not a distributed cache — exactly where
the reference holds it (in-process beside the API client). Executors
re-listing the same (service, region) cells within the TTL skip the API
round-trip; a fresh scan after the TTL refetches. At 1000 executors each
worker caches its own cells, which is the access pattern the work-list
partitioning produces (a cell always lands on the worker that owns it
within a stage).
"""

from __future__ import annotations

import hashlib
import json
import time
from dataclasses import dataclass
from threading import RLock
from typing import Any, Callable


@dataclass
class _Entry:
    value: Any
    timestamp: float
    expiration: float
    size: int


class OperationCache:
    def __init__(self, max_size_mb: float = 64, ttl_seconds: float = 300.0,
                 clock: Callable[[], float] = time.monotonic):
        self._entries: dict[str, _Entry] = {}
        self.max_size = int(max_size_mb * 1024 * 1024)
        self.ttl = ttl_seconds
        self.current_size = 0
        self.hit_count = 0
        self.miss_count = 0
        self.evict_count = 0
        self._clock = clock  # injectable for deterministic expiry tests
        self._lock = RLock()

    @staticmethod
    def _key(service: str, operation: str, params: Any) -> str:
        data = json.dumps(
            {"service": service, "operation": operation, "params": params},
            sort_keys=True, default=str,
        )
        return f"{service}:{operation}:{hashlib.sha256(data.encode()).hexdigest()}"

    def get(self, service: str, operation: str, params: Any = None) -> tuple[Any, bool]:
        key = self._key(service, operation, params)
        with self._lock:
            entry = self._entries.get(key)
            if entry is None or self._clock() > entry.expiration:
                self.miss_count += 1
                return None, False
            self.hit_count += 1
            return entry.value, True

    def set(self, service: str, operation: str, params: Any, value: Any) -> None:
        key = self._key(service, operation, params)
        size = len(json.dumps(value, default=str).encode())
        with self._lock:
            if self.current_size + size > self.max_size:
                self._evict_oldest(size)
            old = self._entries.get(key)
            if old is not None:
                self.current_size -= old.size
            now = self._clock()
            self._entries[key] = _Entry(value, now, now + self.ttl, size)
            self.current_size += size

    def _evict_oldest(self, required: int) -> None:
        while self.current_size + required > self.max_size and self._entries:
            oldest_key = min(self._entries, key=lambda k: self._entries[k].timestamp)
            self.current_size -= self._entries.pop(oldest_key).size
            self.evict_count += 1

    def get_or_fetch(self, service: str, operation: str, params: Any,
                     fetch: Callable[[], Any]) -> Any:
        """The wrap point for scanner page loops: cached pages within the
        TTL short-circuit the API call."""
        value, ok = self.get(service, operation, params)
        if ok:
            return value
        value = fetch()
        self.set(service, operation, params, value)
        return value

    def stats(self) -> dict[str, int]:
        with self._lock:
            return {
                "entries": len(self._entries),
                "current_size": self.current_size,
                "hits": self.hit_count,
                "misses": self.miss_count,
                "evictions": self.evict_count,
            }

    def clear(self) -> None:
        with self._lock:
            self._entries.clear()
            self.current_size = 0
