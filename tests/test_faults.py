"""Unit tests for the shared provider fault policy (ingest/faults.py)."""

from __future__ import annotations

import pytest

from corkscrew_spark.ingest import faults


class TestErrorCodeOf:
    def test_botocore_response_code_wins(self):
        class ClientError(Exception):
            response = {"Error": {"Code": "AccessDenied", "Message": "no"}}

        assert faults.error_code_of(ClientError()) == "AccessDenied"

    def test_azure_status_code(self):
        class HttpResponseError(Exception):
            status_code = 429

        assert faults.error_code_of(HttpResponseError()) == "TooManyRequests"

    def test_k8s_status(self):
        class ApiException(Exception):
            status = 403

        assert faults.error_code_of(ApiException()) == "Forbidden"

    def test_type_name_fallback(self):
        class WeirdTransportError(Exception):
            pass

        assert faults.error_code_of(
            WeirdTransportError()) == "WeirdTransportError"

    def test_unrelated_status_values_ignored(self):
        class Oddball(Exception):
            status = "Running"  # k8s object phase, not an HTTP code

        assert faults.error_code_of(Oddball()) == "Oddball"


class TestCallWithRetry:
    def _throttle(self):
        class Throttled(Exception):
            status_code = 429
        return Throttled("slow down")

    def test_success_passes_through(self):
        result, err = faults.call_with_retry(lambda: [1, 2], retry_base_s=0)
        assert result == [1, 2] and err is None

    def test_empty_result_is_not_an_error(self):
        result, err = faults.call_with_retry(lambda: [], retry_base_s=0)
        assert result == [] and err is None

    def test_throttle_retries_until_success(self):
        state = {"n": 0}

        def fetch():
            state["n"] += 1
            if state["n"] < 3:
                raise self._throttle()
            return "ok"

        result, err = faults.call_with_retry(fetch, max_retries=3,
                                             retry_base_s=0)
        assert (result, err) == ("ok", None) and state["n"] == 3

    def test_throttle_exhaustion_returns_error(self):
        def fetch():
            raise self._throttle()

        result, err = faults.call_with_retry(fetch, max_retries=2,
                                             retry_base_s=0)
        assert result is None
        assert err[0] == "TooManyRequests"

    def test_non_retryable_fails_immediately(self):
        state = {"n": 0}

        def fetch():
            state["n"] += 1
            raise PermissionError("denied")

        result, err = faults.call_with_retry(fetch, max_retries=5,
                                             retry_base_s=0)
        assert state["n"] == 1  # no retry on a non-throttle error
        assert err[0] == "PermissionError" and "denied" in err[1]

    def test_throttle_then_hard_error_stops(self):
        state = {"n": 0}

        def fetch():
            state["n"] += 1
            if state["n"] == 1:
                raise self._throttle()
            raise ValueError("bad payload")

        result, err = faults.call_with_retry(fetch, max_retries=5,
                                             retry_base_s=0)
        assert state["n"] == 2 and err[0] == "ValueError"

    def test_backoff_sleeps_exponentially(self, monkeypatch):
        sleeps = []
        monkeypatch.setattr(faults.time, "sleep", sleeps.append)

        def fetch():
            raise self._throttle()

        faults.call_with_retry(fetch, max_retries=3, retry_base_s=0.1)
        assert sleeps == pytest.approx([0.1, 0.2, 0.4])
