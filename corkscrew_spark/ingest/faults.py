"""Shared provider fault policy: classify, retry throttles, record the rest.

Every provider scanner (AWS paginators, Azure Resource Graph, GCP Asset
Inventory, K8s list/watch) meets the same three failure shapes the
reference handles per provider (plugins/*/tests/failure_mode_test.go):

* throttling — transient by contract; retry the whole unit of work with
  exponential backoff;
* permission/auth errors — deterministic; record and move on;
* anything else — record and move on (a single bad cell must never sink
  a 1000-cell fan-out).

This module is the one implementation of that policy. Scanners call
``call_with_retry`` around their per-cell fetch and turn a returned
error into one error row in their result side-channel
(``aws_scanner.SCAN_RESULT_SCHEMA``).
"""

from __future__ import annotations

import time

#: Error codes the cloud SDKs treat as retryable throttling — union of
#: botocore's public retry config throttling conditions and the Azure /
#: GCP equivalents.
THROTTLE_CODES = frozenset({
    "Throttling", "ThrottlingException", "ThrottledException",
    "RequestThrottled", "RequestThrottledException",
    "RequestLimitExceeded", "TooManyRequestsException", "SlowDown",
    "ProvisionedThroughputExceededException", "TransactionInProgressException",
    "EC2ThrottledException",
    # Azure (HTTP 429 surfaces as these), GCP
    "TooManyRequests", "RateLimitExceeded", "ResourceExhausted",
    "QuotaExceeded",
})

#: Permission errors — never retried, always recorded.
ACCESS_DENIED_CODES = frozenset({
    "AccessDenied", "AccessDeniedException", "AuthFailure",
    "UnauthorizedOperation", "UnrecognizedClientException",
    "InvalidClientTokenId",
    # Azure / GCP
    "AuthorizationFailed", "Forbidden", "PermissionDenied", "Unauthorized",
})


def error_code_of(ex: Exception) -> str:
    """Best-effort provider error code: botocore ClientError carries
    ``response['Error']['Code']``; Azure core errors carry a numeric
    ``status_code``; kubernetes ApiException carries ``status``;
    everything else classifies by exception type name."""
    resp = getattr(ex, "response", None)
    if isinstance(resp, dict):
        code = resp.get("Error", {}).get("Code")
        if code:
            return str(code)
    for attr in ("status_code", "status"):
        status = getattr(ex, attr, None)
        if status == 429:
            return "TooManyRequests"
        if status in (401, 403):
            return "Forbidden"
    return type(ex).__name__


def call_with_retry(fetch, max_retries: int = 3, retry_base_s: float = 0.2):
    """Run ``fetch()`` under the shared policy. Returns ``(result,
    None)`` on success or ``(None, (code, message))`` once a
    non-retryable error occurs or throttling retries are exhausted —
    the caller records the error tuple and continues."""
    for attempt in range(max_retries + 1):
        try:
            return fetch(), None
        except Exception as ex:  # noqa: BLE001 — classified here
            code = error_code_of(ex)
            if code in THROTTLE_CODES and attempt < max_retries:
                time.sleep(retry_base_s * (2 ** attempt))
                continue
            return None, (code, str(ex))
    raise AssertionError("unreachable")  # loop always returns
