"""DuckDB→Spark SQL dialect translation for compliance pack queries.

The reference ships its packs as DuckDB-dialect SQL (e.g.
pkg/query/compliance/packs/cfi/ccc-storage/queries/untrusted_kms_keys.sql:4-6
uses ``unnest(split())``, negative-index ``split_part``, ``array_filter``,
``json_object``). A user pointing this engine at an existing pack
directory must not have to rewrite those files, so the executor routes
them through this translator (SURVEY §7 step 4).

This is a TARGETED shim, not a general transpiler: it covers the DuckDB
surface the reference's packs and docs actually use, keeps everything
else byte-identical, and every rewrite lands on a Spark builtin so the
translated query stays inside whole-stage codegen. Constructs already
shared by both dialects pass through untouched (``split_part`` with
negative index, ``||`` concat, lambdas in ``filter``, CTEs, ``LIKE``).

All rewrites are literal-aware: function names inside string literals or
comments are never touched.

Known, deliberate divergences (documented, not bugs):
  * ``array_to_string([])`` — DuckDB returns NULL for an empty list,
    Spark's ``array_join`` returns ``''``. The Spark behavior is kept
    (non-null is strictly more useful in the details payload; DuckDB's
    NULL silently nulls the whole ``||``-concatenation around it).
  * ``json_object`` maps to ``to_json(named_struct(...))``, which OMITS
    null-valued fields where DuckDB would render ``"k":null``.
"""

from __future__ import annotations

import re

#: opaque regions — single-quoted literals (with '' and backslash escapes),
#: double-quoted identifiers, comments
_OPAQUE_RE = re.compile(
    r"'(?:\\.|''|[^'\\])*'|\"[^\"]*\"|--[^\n]*|/\*.*?\*/", re.DOTALL
)

#: plain name-for-name function renames (argument shapes are identical)
_RENAMES = {
    "json_extract_string": "get_json_object",
    "json_extract": "get_json_object",
    "array_filter": "filter",
    "list_filter": "filter",
    "array_to_string": "array_join",
    "list_aggregate": "aggregate",
    "string_split": "split",
    "str_split": "split",
    "unnest": "explode",
    "list_contains": "array_contains",
    "array_length": "size",
    "len": "length",
    "strftime": "date_format",
    "regexp_matches": "rlike",
    "epoch_ms": "timestamp_millis",
}

_RENAME_RE = re.compile(
    r"\b(" + "|".join(sorted(_RENAMES, key=len, reverse=True)) + r")\s*\(",
    re.IGNORECASE,
)

_JSON_OBJECT_RE = re.compile(r"\bjson_object\s*\(", re.IGNORECASE)
_ARRAY_LITERAL_RE = re.compile(r"\bARRAY\s*\[", re.IGNORECASE)


def _segments(sql: str):
    """Yield (is_opaque, text) fragments covering the whole string."""
    pos = 0
    for m in _OPAQUE_RE.finditer(sql):
        if m.start() > pos:
            yield False, sql[pos:m.start()]
        yield True, m.group(0)
        pos = m.end()
    if pos < len(sql):
        yield False, sql[pos:]


def _map_transparent(sql: str, fn) -> str:
    return "".join(text if opaque else fn(text) for opaque, text in _segments(sql))


def _matching(sql: str, start: int, open_ch: str, close_ch: str) -> int:
    """Index of the bracket closing the one at ``start`` (skips opaque
    regions so brackets inside literals don't count)."""
    depth = 0
    i = start
    n = len(sql)
    while i < n:
        m = _OPAQUE_RE.match(sql, i)
        if m:
            i = m.end()
            continue
        ch = sql[i]
        if ch == open_ch:
            depth += 1
        elif ch == close_ch:
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError(f"unbalanced {open_ch}...{close_ch} in SQL near offset {start}")


def _rewrite_bracketed(sql: str, pattern: re.Pattern, open_ch: str, close_ch: str,
                       head: str, tail: str) -> str:
    """Replace every ``pattern``-match ... matching-close span's delimiters
    with ``head`` ... ``tail``, preserving the inner text (recursion via
    re-scan: innermost spans are left intact in the preserved body)."""
    while True:
        found = None
        pos = 0
        while True:  # first match OUTSIDE opaque regions
            m = pattern.search(sql, pos)
            if m is None:
                break
            if any(o.start() <= m.start() < o.end() for o in _OPAQUE_RE.finditer(sql)):
                pos = m.end()
                continue
            found = m
            break
        if found is None:
            return sql
        open_idx = found.end() - 1
        close_idx = _matching(sql, open_idx, open_ch, close_ch)
        body = sql[found.end():close_idx]
        sql = sql[:found.start()] + head + body + tail + sql[close_idx + 1:]


def _translate_json_object(sql: str, pos: int = 0, top: bool = True) -> str:
    """json_object(k1, v1, ...) → to_json(named_struct(...)) at the top
    level, plain named_struct(...) when nested inside another
    json_object — a nested call must contribute a nested JSON *object*,
    not a double-encoded JSON string. named_struct takes the same
    alternating literal-key/value argument list and allows heterogeneous
    value types (string columns, maps, booleans), which map() would
    reject."""
    while True:
        found = None
        scan = pos
        while True:
            m = _JSON_OBJECT_RE.search(sql, scan)
            if m is None:
                break
            if any(o.start() <= m.start() < o.end() for o in _OPAQUE_RE.finditer(sql)):
                scan = m.end()
                continue
            found = m
            break
        if found is None:
            return sql
        open_idx = found.end() - 1
        close_idx = _matching(sql, open_idx, "(", ")")
        body = _translate_json_object(sql[found.end():close_idx], 0, top=False)
        head, tail = ("to_json(named_struct(", "))") if top else ("named_struct(", ")")
        replaced = head + body + tail
        sql = sql[:found.start()] + replaced + sql[close_idx + 1:]
        pos = found.start() + len(replaced)


def duckdb_to_spark(sql: str) -> str:
    """Translate a DuckDB-dialect pack query to Spark SQL."""
    sql = _translate_json_object(sql)
    # ARRAY[...] literal → array(...)
    sql = _rewrite_bracketed(sql, _ARRAY_LITERAL_RE, "[", "]", "array(", ")")
    # name-for-name renames, outside literals/comments
    sql = _map_transparent(
        sql, lambda t: _RENAME_RE.sub(lambda m: _RENAMES[m.group(1).lower()] + "(", t)
    )
    # drop the statement-terminating semicolon (Spark rejects it)
    return re.sub(r";\s*$", "", sql.rstrip())
