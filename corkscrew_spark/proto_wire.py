"""Pure-Python proto3 wire-format codec for the CorkscrewAPI messages.

The reference's API server speaks protobuf gRPC
(/root/reference/proto/api.proto:8-22, internal/server/api_server.go:56-
295). Neither ``protobuf`` nor ``grpcio`` is installable in this
environment, so this module implements the (public, very small) proto3
binary wire format directly — varints, tags, and length-delimited
fields — driven by message descriptors transcribed from api.proto. The
bytes produced here are exactly what protoc-generated stubs emit/accept
for the same messages, which is what makes the transport interoperable:

* ``server_grpc.GrpcApiServer`` plugs ``encode``/``decode`` into
  grpcio's generic method handlers as the serializer pair (grpcio treats
  serializers as opaque ``bytes <-> object`` callables, so no generated
  stubs are required);
* ``server.ApiServer`` exposes the same binary envelopes over
  ``POST /v1/grpc/<Method>`` so the proto contract is exercisable even
  where grpcio is absent (this sandbox).

Scope: only the types api.proto uses — (u)int32/64, bool, string, enum,
nested messages, repeated fields, ``map<string, string>``, and
``google.protobuf.Timestamp``. Proto3 semantics: scalar defaults are
omitted on encode and implied on decode; unknown fields are skipped.

Messages are plain Python dicts keyed by field name; maps are dicts;
repeated fields are lists; Timestamps are ``{"seconds": int, "nanos":
int}`` dicts.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# varint / tag primitives
# ---------------------------------------------------------------------------

_WT_VARINT = 0
_WT_I64 = 1
_WT_LEN = 2
_WT_I32 = 5


def encode_varint(value: int) -> bytes:
    """Unsigned LEB128. Negative int32/int64 values are encoded as their
    64-bit two's complement, exactly as protoc does."""
    if value < 0:
        value &= (1 << 64) - 1
    out = bytearray()
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _tag(field_num: int, wire_type: int) -> bytes:
    return encode_varint((field_num << 3) | wire_type)


def _signed64(value: int) -> int:
    """Re-interpret a decoded unsigned varint as a signed 64-bit int."""
    return value - (1 << 64) if value >= (1 << 63) else value


# ---------------------------------------------------------------------------
# descriptor-driven message codec
# ---------------------------------------------------------------------------
#
# A descriptor is {field_number: (name, kind[, sub_descriptor])} with kind:
#   "string" "bool" "int32" "int64" "enum"          — singular scalars
#   "message"                                        — nested (sub needed)
#   "repeated_string" "repeated_message"             — lists
#   "map_str_str"                                    — map<string, string>


def encode(msg: dict, descriptor: dict) -> bytes:
    out = bytearray()
    for num in sorted(descriptor):
        spec = descriptor[num]
        name, kind = spec[0], spec[1]
        val = msg.get(name)
        if val is None:
            continue
        if kind == "string":
            if val != "":
                data = val.encode("utf-8")
                out += _tag(num, _WT_LEN) + encode_varint(len(data)) + data
        elif kind == "bool":
            if val:
                out += _tag(num, _WT_VARINT) + encode_varint(1)
        elif kind in ("int32", "int64", "enum"):
            if val != 0:
                out += _tag(num, _WT_VARINT) + encode_varint(int(val))
        elif kind == "message":
            data = encode(val, spec[2])
            out += _tag(num, _WT_LEN) + encode_varint(len(data)) + data
        elif kind == "repeated_string":
            for item in val:
                data = item.encode("utf-8")
                out += _tag(num, _WT_LEN) + encode_varint(len(data)) + data
        elif kind == "repeated_message":
            for item in val:
                data = encode(item, spec[2])
                out += _tag(num, _WT_LEN) + encode_varint(len(data)) + data
        elif kind == "map_str_str":
            # map<k, v> is wire-identical to repeated {1: key, 2: value}
            for k in sorted(val):
                entry = bytearray()
                kd = k.encode("utf-8")
                entry += _tag(1, _WT_LEN) + encode_varint(len(kd)) + kd
                vd = str(val[k]).encode("utf-8")
                entry += _tag(2, _WT_LEN) + encode_varint(len(vd)) + vd
                out += _tag(num, _WT_LEN) + encode_varint(len(entry)) + entry
        else:
            raise ValueError(f"unknown field kind {kind!r}")
    return bytes(out)


def _bounds_check(buf: bytes, pos: int, n: int) -> None:
    """A length prefix (or fixed width) that extends past the buffer means
    the message was truncated in transit — raise, exactly as a truncated
    varint does, so the transport's malformed-request accounting fires
    instead of silently decoding a short slice to wrong values."""
    if pos + n > len(buf):
        raise ValueError(
            f"truncated message: field needs {n} bytes at offset {pos}, "
            f"buffer has {len(buf) - pos}")


def _skip(buf: bytes, pos: int, wire_type: int) -> int:
    if wire_type == _WT_VARINT:
        _, pos = decode_varint(buf, pos)
        return pos
    if wire_type == _WT_I64:
        _bounds_check(buf, pos, 8)
        return pos + 8
    if wire_type == _WT_LEN:
        n, pos = decode_varint(buf, pos)
        _bounds_check(buf, pos, n)
        return pos + n
    if wire_type == _WT_I32:
        _bounds_check(buf, pos, 4)
        return pos + 4
    raise ValueError(f"unsupported wire type {wire_type}")


def decode(buf: bytes, descriptor: dict) -> dict:
    """Decode to a dict with EVERY descriptor field present (proto3
    defaults filled in) — handlers never need .get() chains."""
    msg = _defaults(descriptor)
    pos = 0
    while pos < len(buf):
        key, pos = decode_varint(buf, pos)
        num, wire_type = key >> 3, key & 0x7
        spec = descriptor.get(num)
        if spec is None:
            pos = _skip(buf, pos, wire_type)
            continue
        name, kind = spec[0], spec[1]
        if kind in ("bool", "int32", "int64", "enum"):
            raw, pos = decode_varint(buf, pos)
            if kind == "bool":
                msg[name] = bool(raw)
            else:
                # negative int32s arrive as 64-bit two's complement,
                # same as int64 — one signed reinterpretation covers both
                msg[name] = _signed64(raw)
        elif kind in ("string", "message", "repeated_string",
                      "repeated_message", "map_str_str"):
            n, pos = decode_varint(buf, pos)
            _bounds_check(buf, pos, n)
            data = buf[pos:pos + n]
            pos += n
            if kind == "string":
                msg[name] = data.decode("utf-8")
            elif kind == "message":
                msg[name] = decode(data, spec[2])
            elif kind == "repeated_string":
                msg[name].append(data.decode("utf-8"))
            elif kind == "repeated_message":
                msg[name].append(decode(data, spec[2]))
            else:  # map entry
                entry = decode(data, {1: ("key", "string"),
                                      2: ("value", "string")})
                msg[name][entry["key"]] = entry["value"]
        else:
            raise ValueError(f"unknown field kind {kind!r}")
    return msg


def _defaults(descriptor: dict) -> dict:
    out = {}
    for spec in descriptor.values():
        name, kind = spec[0], spec[1]
        if kind == "string":
            out[name] = ""
        elif kind == "bool":
            out[name] = False
        elif kind in ("int32", "int64", "enum"):
            out[name] = 0
        elif kind == "message":
            out[name] = None
        elif kind in ("repeated_string", "repeated_message"):
            out[name] = []
        elif kind == "map_str_str":
            out[name] = {}
    return out


# ---------------------------------------------------------------------------
# api.proto descriptors (proto/api.proto:25-152)
# ---------------------------------------------------------------------------

TIMESTAMP = {1: ("seconds", "int64"), 2: ("nanos", "int32")}

API_QUERY_RESULT = {1: ("values", "map_str_str")}

API_EXECUTE_QUERY_REQUEST = {
    1: ("query", "string"),
    2: ("output_format", "string"),
    3: ("parameters", "map_str_str"),
    4: ("limit", "int32"),
}

API_EXECUTE_QUERY_RESPONSE = {
    1: ("rows", "repeated_message", API_QUERY_RESULT),
    2: ("columns", "repeated_string"),
    3: ("row_count", "int32"),
    4: ("error", "string"),
    5: ("execution_time_ms", "int64"),
}

API_HEALTH_CHECK_REQUEST: dict = {}

#: APIHealthStatus enum (api.proto:89-94)
HEALTH_STATUS = {"UNKNOWN": 0, "HEALTHY": 1, "UNHEALTHY": 2, "DEGRADED": 3}

API_HEALTH_CHECK_RESPONSE = {
    1: ("status", "enum"),
    2: ("version", "string"),
    3: ("timestamp", "message", TIMESTAMP),
    4: ("details", "map_str_str"),
}

API_PROVIDER_STATUS = {
    1: ("available", "bool"),
    2: ("initialized", "bool"),
    3: ("error", "string"),
    4: ("last_check", "message", TIMESTAMP),
}

API_PROVIDER_INFO = {
    1: ("name", "string"),
    2: ("version", "string"),
    3: ("description", "string"),
    4: ("supported_services", "repeated_string"),
    5: ("capabilities", "map_str_str"),
    6: ("status", "message", API_PROVIDER_STATUS),
}

API_LIST_PROVIDERS_REQUEST = {1: ("include_status", "bool")}

API_LIST_PROVIDERS_RESPONSE = {
    1: ("providers", "repeated_message", API_PROVIDER_INFO),
}

API_GET_PROVIDER_INFO_REQUEST = {1: ("provider", "string")}

API_PROVIDER_INFO_RESPONSE = {
    1: ("provider_info", "message", API_PROVIDER_INFO),
    2: ("error", "string"),
}

API_SYSTEM_STATS = {
    1: ("uptime_seconds", "int64"),
    2: ("memory_usage_bytes", "int64"),
    3: ("active_connections", "int32"),
    4: ("total_requests", "int64"),
    5: ("total_errors", "int64"),
}

API_DATABASE_STATUS = {
    1: ("available", "bool"),
    2: ("path", "string"),
    3: ("size_bytes", "int64"),
    4: ("table_count", "int32"),
    5: ("total_resources", "int64"),
    6: ("last_scan", "message", TIMESTAMP),
    7: ("error", "string"),
}

API_GET_STATUS_REQUEST = {
    1: ("include_providers", "bool"),
    2: ("include_database", "bool"),
}

API_GET_STATUS_RESPONSE = {
    1: ("overall_status", "enum"),
    2: ("provider_status", "repeated_message", API_PROVIDER_STATUS),
    3: ("database_status", "message", API_DATABASE_STATUS),
    4: ("system_stats", "message", API_SYSTEM_STATS),
    5: ("timestamp", "message", TIMESTAMP),
}

API_IDMS_SERVICE = {
    1: ("provider", "string"),
    2: ("service_type", "string"),
    3: ("name", "string"),
    4: ("region", "string"),
    5: ("endpoint", "string"),
    6: ("status", "string"),
    7: ("metadata", "map_str_str"),
    8: ("discovered_at", "message", TIMESTAMP),
}

API_DISCOVER_IDMS_REQUEST = {1: ("force_refresh", "bool")}

API_DISCOVER_IDMS_RESPONSE = {
    1: ("success", "bool"),
    2: ("services", "repeated_message", API_IDMS_SERVICE),
    3: ("total_found", "int32"),
    4: ("duration_ms", "int64"),
    5: ("errors", "repeated_string"),
    6: ("discovered_at", "message", TIMESTAMP),
    7: ("error", "string"),
}

#: RPC name → (request descriptor, response descriptor), mirroring the
#: CorkscrewAPI service block (api.proto:8-22).
SERVICE_METHODS = {
    "ListProviders": (API_LIST_PROVIDERS_REQUEST,
                      API_LIST_PROVIDERS_RESPONSE),
    "GetProviderInfo": (API_GET_PROVIDER_INFO_REQUEST,
                        API_PROVIDER_INFO_RESPONSE),
    "HealthCheck": (API_HEALTH_CHECK_REQUEST, API_HEALTH_CHECK_RESPONSE),
    "GetStatus": (API_GET_STATUS_REQUEST, API_GET_STATUS_RESPONSE),
    "ExecuteQuery": (API_EXECUTE_QUERY_REQUEST, API_EXECUTE_QUERY_RESPONSE),
    "DiscoverIDMSServices": (API_DISCOVER_IDMS_REQUEST,
                             API_DISCOVER_IDMS_RESPONSE),
}

SERVICE_NAME = "corkscrew.api.CorkscrewAPI"
