"""Conservative conjunctive-predicate extraction from SQL text.

The bridge between the engine's SQL surface and file-level data
skipping (``skipping.plan_skip``): given an already-validated,
already-bound SELECT, find the simple ``col op literal`` conjuncts of
its WHERE clause so the table's view can be re-pointed at a
``read_skipping`` pruned read before execution.

Soundness does NOT depend on completeness: the engine executes the
FULL original SQL against the pruned view, so pruning with any SUBSET
of the WHERE's top-level conjuncts keeps every file a full scan would
need (each conjunct is implied by the whole predicate). Anything this
parser is unsure about it simply ignores:

* queries that aren't single-table (JOINs, comma lists, subqueries)
  yield no table — multi-table pruning would need per-table predicate
  attribution, which raw text can't do safely;
* a top-level OR in the WHERE yields no conjuncts from
  ``extract_predicates`` (a disjunct prunes nothing on its own) — but
  ``extract_disjuncts`` recovers the DNF branches for
  ``skipping.plan_skip_any`` when EVERY disjunct contributes at least
  one simple conjunct;
* any conjunct that isn't literally ``col op literal`` / ``BETWEEN`` /
  ``IN (list)`` / ``IS [NOT] NULL`` — function calls, arithmetic,
  column-to-column comparisons, qualified refs to another alias — is
  dropped from the extraction, never guessed at.

Reference parity: the reference hands its SQL to DuckDB, whose
planner prunes row groups from the real predicate tree
(``internal/db``); this module recovers the prunable fragment for the
file-level analogue without re-implementing a SQL planner.
"""

from __future__ import annotations

import datetime as _dt
import functools
import re

_KEYWORDS = {
    "AND", "OR", "NOT", "IN", "IS", "NULL", "BETWEEN", "LIKE",
    "WHERE", "FROM", "JOIN", "GROUP", "ORDER", "LIMIT", "HAVING",
    "WINDOW", "UNION", "INTERSECT", "EXCEPT", "SELECT", "AS",
    "DATE", "TIMESTAMP", "QUALIFY", "DISTRIBUTE", "CLUSTER", "SORT",
    "LATERAL", "TABLESAMPLE", "PIVOT", "UNPIVOT", "ON", "USING",
    "CROSS", "NATURAL", "LEFT", "RIGHT", "FULL", "INNER", "OUTER",
    "SEMI", "ANTI", "VALUES", "WITH", "EXISTS",
    "CASE", "WHEN", "THEN", "ELSE", "END",
}

#: CASE expressions nest boolean connectives WITHOUT parentheses —
#: an AND/OR inside `CASE WHEN a=1 AND q=2 ...` is NOT a top-level
#: conjunct, and splitting through it would mint predicates the WHERE
#: does not imply (wrong rows, not wasted I/O). ``_collapse_case``
#: swallows each CASE…END span into one opaque token BEFORE the
#: splitters run: the span's internal AND/OR can no longer be split
#: through, the conjunct containing the opaque token parses to
#: nothing (never guessed at), and the CLEAN top-level conjuncts
#: sitting NEXT to a CASE keep pruning.
_CASE_KWS = {"CASE", "WHEN", "THEN", "ELSE", "END"}


def _collapse_case(
        toks: list[tuple[str, str]]) -> list[tuple[str, str]] | None:
    """Replace every CASE…END span (nesting-aware: CASE opens, END is
    the hard delimiter that closes) with a single unparseable
    ``("opaque", "CASE")`` token. None — the caller must extract
    NOTHING — when the spans can't be delimited safely: an unmatched
    CASE (e.g. a column literally named ``case``) or a span that
    crosses its enclosing parenthesis (malformed text; collapsing it
    would unbalance the depth tracking the splitters rely on).

    A WHEN/THEN/ELSE/END *outside* any span is NOT a stand-down: a
    real CASE span always opens with the CASE keyword (which sets the
    depth), so a depth-0 occurrence can only be a column unquoted-named
    with a non-reserved word (``end`` is common in period tables). It
    maps to an opaque token — ITS term fails literal parsing and drops,
    while clean sibling conjuncts keep pruning; the old whole-statement
    stand-down turned ``WHERE end >= 5 AND tenant = 'x'`` into a bare
    full-scan estimate the armed governor then REFUSED, telling the
    user to add the selective predicate they already had."""
    out: list[tuple[str, str]] = []
    depth = 0  # CASE nesting; 0 = outside any span
    pdepth = 0  # paren depth INSIDE the current span
    for k, v in toks:
        if depth == 0:
            if (k, v) == ("kw", "CASE"):
                depth = 1
                pdepth = 0
                out.append(("opaque", "CASE"))
            elif k == "kw" and v in _CASE_KWS:
                # a column named end/when/then/else: opaque its own
                # term only (see docstring)
                out.append(("opaque", v))
            else:
                out.append((k, v))
            continue
        if (k, v) == ("kw", "CASE"):
            depth += 1
        elif (k, v) == ("kw", "END"):
            depth -= 1
        elif (k, v) == ("punc", "("):
            pdepth += 1
        elif (k, v) == ("punc", ")"):
            pdepth -= 1
            if pdepth < 0:
                return None  # span escapes its enclosing parens
    return out if depth == 0 else None  # unmatched CASE: stand down

_TOKEN_RE = re.compile(
    r"""(?P<ws>\s+|--[^\n]*|/\*.*?\*/)
      | (?P<str>'(?:\\.|''|[^'\\])*')
      | (?P<bq>`[^`]+`)
      | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
      | (?P<num>(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
      | (?P<op><=|>=|<>|!=|==|=|<|>)
      | (?P<punc>[(),.;*+\-/%\[\]{}:])
    """,
    re.VERBOSE | re.DOTALL,
)


class _Unparseable(Exception):
    pass


@functools.lru_cache(maxsize=256)
def _tokens_spans(
        sql: str) -> tuple[list[tuple[str, str]], list[tuple[int, int]]]:
    """(tokens, spans): tokens as in ``_tokens``, spans as each token's
    (start, end) character offsets in ``sql`` — the rewrite half
    (``rewrite_table_refs``) needs to splice replacement text exactly
    where the original token sat.

    Memoized on the statement text: one governed engine query walks
    the extraction cascade (resolvers, segmenters, extractors, rewrite)
    8-10 times over the SAME string, and every caller treats the token
    list as read-only (they build new lists, never mutate) — so the
    repeated O(len) regex lexing per statement collapses to one."""
    out: list[tuple[str, str]] = []
    spans: list[tuple[int, int]] = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if m is None:
            raise _Unparseable(sql[pos:pos + 10])
        start, pos = pos, m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group(0)
        if kind == "ident" and text.upper() in _KEYWORDS:
            out.append(("kw", text.upper()))
        else:
            out.append((kind, text))
        spans.append((start, pos))
    return out, spans


def _tokens(sql: str) -> list[tuple[str, str]]:
    """(kind, text) tokens; kind in str/bq/ident/kw/num/op/punc.
    Raises _Unparseable on any character the lexer doesn't know —
    callers treat that as 'extract nothing' (sound)."""
    return _tokens_spans(sql)[0]


def _unquote_ident(tok: tuple[str, str]) -> str:
    kind, text = tok
    return text[1:-1] if kind == "bq" else text


def _unquote_str(text: str) -> str | None:
    """Invert EXACTLY engine.quote_literal's escaping dialect — ''
    doubling, backslash-escaped quote, doubled backslash — and refuse
    everything else (None = term unparseable). Spark's lexer decodes
    \n/\t/\b/... into CONTROL characters while a naive decoder would
    yield the letter; a value that disagrees with the executed filter
    would prune files containing matching rows, so any escape the
    binder never emits makes the term contribute nothing."""
    body = text[1:-1]
    out = []
    i = 0
    while i < len(body):
        ch = body[i]
        if ch == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            if nxt not in ("\\", "'"):
                return None  # an escape quote_literal never writes
            out.append(nxt)
            i += 2
        elif ch == "'" and i + 1 < len(body) and body[i + 1] == "'":
            out.append("'")
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def single_table(sql: str) -> tuple[str, str | None] | None:
    """``(table, alias|None)`` when the statement is a single-table
    SELECT: exactly one FROM, no JOIN/comma/subquery in its table
    position, no set operators. None otherwise — the safe answer."""
    try:
        toks = _tokens(sql)
    except _Unparseable:
        return None
    kws = [t for t in toks if t[0] == "kw"]
    if sum(1 for k, v in kws if v == "FROM") != 1:
        return None
    if any(v in ("JOIN", "UNION", "INTERSECT", "EXCEPT", "LATERAL",
                 "TABLESAMPLE", "PIVOT", "UNPIVOT", "VALUES",
                 # a CTE can shadow the registered view — re-pointing
                 # would then be a harmless no-op, but don't reason
                 # about shadowing at all: just stand down
                 "WITH", "EXISTS")
           for _k, v in kws):
        return None
    i = next(i for i, t in enumerate(toks) if t == ("kw", "FROM"))
    j = i + 1
    if j >= len(toks) or toks[j][0] not in ("ident", "bq"):
        return None  # FROM (subquery) / FROM VALUES — not a table ref
    table = _unquote_ident(toks[j])
    j += 1
    alias = None
    if j < len(toks) and toks[j] == ("kw", "AS"):
        j += 1
        if j >= len(toks) or toks[j][0] not in ("ident", "bq"):
            return None
        alias = _unquote_ident(toks[j])
        j += 1
    elif j < len(toks) and toks[j][0] in ("ident", "bq"):
        alias = _unquote_ident(toks[j])
        j += 1
    if j < len(toks):
        k, v = toks[j]
        if (k, v) == ("punc", ","):
            return None  # comma join
        if k == "punc" and v == ".":
            return None  # db-qualified name — not a registered view
        if not (k == "kw" and v in ("WHERE", "GROUP", "ORDER", "LIMIT",
                                    "HAVING", "WINDOW", "QUALIFY",
                                    "DISTRIBUTE", "CLUSTER", "SORT")) \
                and (k, v) != ("punc", ";") and (k, v) != ("punc", ")"):
            return None
    return table, alias


def join_chain_tables(
        sql: str) -> list[tuple[str, str | None, bool]] | None:
    """Table references when the statement is a SELECT over a linear
    INNER/LEFT-join chain — ``FROM t1 [AS a] ([INNER|LEFT [OUTER]]
    JOIN t2 [AS b] ON ...)*`` — as ``[(table, alias|None, prunable),
    ...]``. None for ANY other shape.

    ``prunable`` is the soundness verdict per reference: pruning a
    table's files drops rows that provably fail that table's own
    conjuncts, which is sound only if every OUTPUT row's columns for
    that table come from a REAL row of it — a null-extended row would
    instead be wrongly dropped (or a ``t.col IS NULL`` predicate would
    wrongly accept it). In a left-associative chain of INNER and LEFT
    joins, the only null-extendable table is the RIGHT side of each
    LEFT join: the first table and every INNER-joined table are
    preserved by construction, so they prune. RIGHT/FULL (which
    null-extend EARLIER tables), CROSS/NATURAL/SEMI/ANTI, USING,
    comma lists, subqueries, and set operators all bail."""
    try:
        toks = _tokens(sql)
    except _Unparseable:
        return None
    kws = {v for k, v in toks if k == "kw"}
    if sum(1 for k, v in toks if (k, v) == ("kw", "FROM")) != 1:
        return None
    if kws & {"UNION", "INTERSECT", "EXCEPT", "LATERAL", "TABLESAMPLE",
              "PIVOT", "UNPIVOT", "VALUES", "WITH", "EXISTS",
              "RIGHT", "FULL", "CROSS", "NATURAL", "SEMI", "ANTI",
              "USING"}:
        return None
    i = next(i for i, t in enumerate(toks) if t == ("kw", "FROM"))
    out: list[tuple[str, str | None, bool]] = []
    j = i + 1

    def _table_ref(j):
        if j >= len(toks) or toks[j][0] not in ("ident", "bq"):
            return None
        table = _unquote_ident(toks[j])
        j += 1
        if j < len(toks) and toks[j] == ("punc", "."):
            return None  # db-qualified name — not a registered view
        alias = None
        if j < len(toks) and toks[j] == ("kw", "AS"):
            j += 1
            if j >= len(toks) or toks[j][0] not in ("ident", "bq"):
                return None
            alias = _unquote_ident(toks[j])
            j += 1
        elif j < len(toks) and toks[j][0] in ("ident", "bq"):
            alias = _unquote_ident(toks[j])
            j += 1
        return table, alias, j

    ref = _table_ref(j)
    if ref is None:
        return None
    out.append((ref[0], ref[1], True))  # FROM table: always preserved
    j = ref[2]
    while j < len(toks):
        k, v = toks[j]
        if (k, v) == ("punc", ","):
            return None  # comma join: keep the accepted grammar tight
        joined_prunable = None
        if (k, v) == ("kw", "INNER"):
            if j + 1 >= len(toks) or toks[j + 1] != ("kw", "JOIN"):
                return None
            joined_prunable = True
            j += 1
        elif (k, v) == ("kw", "LEFT"):
            j += 1
            if j < len(toks) and toks[j] == ("kw", "OUTER"):
                j += 1
            if j >= len(toks) or toks[j] != ("kw", "JOIN"):
                return None
            joined_prunable = False  # right side of LEFT: extendable
        elif (k, v) == ("kw", "JOIN"):
            joined_prunable = True
        if joined_prunable is not None:
            ref = _table_ref(j + 1)
            if ref is None:
                return None
            out.append((ref[0], ref[1], joined_prunable))
            j = ref[2]
            if j >= len(toks) or toks[j] != ("kw", "ON"):
                return None
            # skip the ON condition up to the next top-level JOIN /
            # clause keyword
            depth = 0
            j += 1
            while j < len(toks):
                k2, v2 = toks[j]
                if (k2, v2) == ("punc", "("):
                    depth += 1
                elif (k2, v2) == ("punc", ")"):
                    depth -= 1
                elif depth == 0 and k2 == "kw" and v2 in (
                        "JOIN", "INNER", "LEFT", "WHERE", "GROUP",
                        "ORDER", "LIMIT", "HAVING", "WINDOW", "QUALIFY",
                        "DISTRIBUTE", "CLUSTER", "SORT"):
                    break
                j += 1
            continue
        if k == "kw" and v in ("WHERE", "GROUP", "ORDER", "LIMIT",
                               "HAVING", "WINDOW", "QUALIFY",
                               "DISTRIBUTE", "CLUSTER", "SORT"):
            break
        if (k, v) == ("punc", ";"):
            break
        return None  # anything else in table position: stand down
    return out if len(out) >= 2 else None


def inner_join_tables(
        sql: str) -> list[tuple[str, str | None]] | None:
    """``join_chain_tables`` restricted to PURE inner chains (every
    table prunable) — the original strict surface, kept for callers
    and tests that reason about inner-only semantics."""
    chain = join_chain_tables(sql)
    if chain is None or any(not p for _t, _a, p in chain):
        return None
    return [(t, a) for t, a, _p in chain]


def _where_tokens(toks: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Tokens of the (single) WHERE clause at paren depth 0, up to the
    next top-level clause keyword; [] when there is no WHERE."""
    depth = 0
    start = None
    for i, (k, v) in enumerate(toks):
        if (k, v) == ("punc", "("):
            depth += 1
        elif (k, v) == ("punc", ")"):
            depth -= 1
        elif depth == 0 and (k, v) == ("kw", "WHERE"):
            if start is not None:
                return []  # two top-level WHEREs: not a shape we parse
            start = i + 1
    if start is None:
        return []
    out = []
    depth = 0
    for k, v in toks[start:]:
        if (k, v) == ("punc", "("):
            depth += 1
        elif (k, v) == ("punc", ")"):
            if depth == 0:
                break  # closing a subquery we're inside of
            depth -= 1
        elif depth == 0 and k == "kw" and v in (
                "GROUP", "ORDER", "LIMIT", "HAVING", "WINDOW", "QUALIFY",
                "UNION", "INTERSECT", "EXCEPT",
                "DISTRIBUTE", "CLUSTER", "SORT"):
            break
        elif depth == 0 and (k, v) == ("punc", ";"):
            break
        out.append((k, v))
    return out


def _split_conjuncts(
        where: list[tuple[str, str]]) -> list[list[tuple[str, str]]] | None:
    """Split on top-level AND (BETWEEN's AND binds to its BETWEEN).
    None when a top-level OR makes conjunct extraction impossible."""
    terms: list[list[tuple[str, str]]] = [[]]
    depth = 0
    pending_between = 0
    for k, v in where:
        if (k, v) == ("punc", "("):
            depth += 1
        elif (k, v) == ("punc", ")"):
            depth -= 1
        if depth == 0 and (k, v) == ("kw", "OR"):
            return None
        if depth == 0 and (k, v) == ("kw", "AND") and pending_between == 0:
            terms.append([])
            continue
        if depth == 0 and (k, v) == ("kw", "BETWEEN"):
            pending_between += 1
        elif depth == 0 and (k, v) == ("kw", "AND") and pending_between:
            pending_between -= 1
        terms[-1].append((k, v))
    return [t for t in terms if t]


def _parse_lit(toks: list[tuple[str, str]], i: int):
    """Literal starting at index i -> (value, next_index) or None."""
    if i >= len(toks):
        return None
    k, v = toks[i]
    neg = False
    if (k, v) == ("punc", "-"):
        neg = True
        i += 1
        if i >= len(toks):
            return None
        k, v = toks[i]
    if k == "num":
        num = (float(v) if ("." in v or "e" in v or "E" in v) else int(v))
        return (-num if neg else num), i + 1
    if neg:
        return None
    if k == "str":
        s = _unquote_str(v)
        return None if s is None else (s, i + 1)
    if k == "kw" and v in ("DATE", "TIMESTAMP") and i + 1 < len(toks) \
            and toks[i + 1][0] == "str":
        raw = _unquote_str(toks[i + 1][1])
        if raw is None:
            return None
        try:
            if v == "DATE":
                return _dt.date.fromisoformat(raw), i + 2
            return _dt.datetime.fromisoformat(raw), i + 2
        except ValueError:
            return None
    return None


def _parse_colref(toks: list[tuple[str, str]], i: int,
                  names: set[str], require_qualifier: bool = False):
    """Column reference at index i -> (col, next_index) or None.
    A qualifier must be the table name or its alias (``names``,
    lower-cased); anything else is treated as not-a-column. With
    ``require_qualifier`` an UNQUALIFIED name is rejected too — in a
    multi-table query a bare column can belong to any table, so only
    explicit ``t.col`` refs are attributable."""
    if i >= len(toks) or toks[i][0] not in ("ident", "bq"):
        return None
    first = _unquote_ident(toks[i])
    j = i + 1
    if j + 1 < len(toks) and toks[j] == ("punc", ".") \
            and toks[j + 1][0] in ("ident", "bq"):
        if first.lower() not in names:
            return None
        return _unquote_ident(toks[j + 1]), j + 2
    if require_qualifier:
        return None
    return first, j


_OPS_MAP = {"=": "=", "==": "=", "<": "<", "<=": "<=",
            ">": ">", ">=": ">="}
_FLIP = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "="}


def _parse_term(toks: list[tuple[str, str]],
                names: set[str],
                require_qualifier: bool = False) -> tuple | None:
    """One conjunct -> (col, op, value) in skipping's predicate form,
    or None when it isn't a simple prunable shape."""
    toks = _strip_enclosing_parens(toks)
    # literal-first comparison: lit op col
    lit = _parse_lit(toks, 0)
    if lit is not None:
        value, i = lit
        if i < len(toks) and toks[i][0] == "op" \
                and toks[i][1] in _OPS_MAP:
            op = _FLIP[_OPS_MAP[toks[i][1]]]
            ref = _parse_colref(toks, i + 1, names, require_qualifier)
            if ref is not None and ref[1] == len(toks):
                return ref[0], op, value
        return None
    ref = _parse_colref(toks, 0, names, require_qualifier)
    if ref is None:
        return None
    col, i = ref
    if i >= len(toks):
        return None
    k, v = toks[i]
    if k == "op" and v in _OPS_MAP:
        lit = _parse_lit(toks, i + 1)
        if lit is not None and lit[1] == len(toks):
            return col, _OPS_MAP[v], lit[0]
        return None
    if (k, v) == ("kw", "BETWEEN"):
        lo = _parse_lit(toks, i + 1)
        if lo is None:
            return None
        j = lo[1]
        if j >= len(toks) or toks[j] != ("kw", "AND"):
            return None
        hi = _parse_lit(toks, j + 1)
        if hi is not None and hi[1] == len(toks):
            return col, "between", (lo[0], hi[0])
        return None
    if (k, v) == ("kw", "IN") and i + 1 < len(toks) \
            and toks[i + 1] == ("punc", "("):
        members = []
        j = i + 2
        while True:
            lit = _parse_lit(toks, j)
            if lit is None:
                return None
            members.append(lit[0])
            j = lit[1]
            if j >= len(toks):
                return None
            if toks[j] == ("punc", ","):
                j += 1
                continue
            if toks[j] == ("punc", ")") and j == len(toks) - 1:
                return col, "in", members
            return None
    if (k, v) == ("kw", "IS"):
        rest = toks[i + 1:]
        if rest == [("kw", "NULL")]:
            return col, "is_null", None
        if rest == [("kw", "NOT"), ("kw", "NULL")]:
            return col, "is_not_null", None
    return None


def extract_predicates(sql: str, table: str,
                       alias: str | None = None,
                       qualified_only: bool = False) -> list[tuple]:
    """The WHERE clause's simple conjuncts over ``table`` (or its
    ``alias``) in ``skipping`` predicate form. Empty list whenever the
    text is anything but certain — pruning on a subset of conjuncts is
    sound, pruning on a guess is not. ``qualified_only`` (the
    multi-table mode) accepts only explicitly ``t.col``-qualified
    terms, since a bare column in a join could belong to any table."""
    try:
        toks = _tokens(sql)
    except _Unparseable:
        return []
    # an alias REPLACES the table name as a qualifier (Spark rejects
    # `t.col FROM t AS u`), and honoring the raw name would let
    # `FROM a x JOIN b a` mis-attribute b's predicates to table a
    names = {(alias or table).lower()}
    where = _where_tokens(toks)
    if not where:
        return []
    where = _collapse_case(where)
    if where is None:
        return []
    conjuncts = _split_conjuncts(_strip_enclosing_parens(where))
    if conjuncts is None:
        return []
    out = []
    for term in conjuncts:
        parsed = _parse_term(term, names, qualified_only)
        if parsed is not None:
            out.append(parsed)
    return out




def _strip_enclosing_parens(
        toks: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Remove paren pairs that enclose the WHOLE token list."""
    while (len(toks) >= 2 and toks[0] == ("punc", "(")
           and toks[-1] == ("punc", ")")):
        depth = 0
        closes_at_end = True
        for idx, t in enumerate(toks):
            if t == ("punc", "("):
                depth += 1
            elif t == ("punc", ")"):
                depth -= 1
                if depth == 0 and idx != len(toks) - 1:
                    closes_at_end = False
                    break
        if not closes_at_end:
            break
        toks = toks[1:-1]
    return toks


def _split_disjuncts(
        where: list[tuple[str, str]]) -> list[list[tuple[str, str]]]:
    """Split on top-level OR (parens-aware). A single element means the
    WHERE has no top-level OR."""
    parts: list[list[tuple[str, str]]] = [[]]
    depth = 0
    for k, v in where:
        if (k, v) == ("punc", "("):
            depth += 1
        elif (k, v) == ("punc", ")"):
            depth -= 1
        if depth == 0 and (k, v) == ("kw", "OR"):
            parts.append([])
            continue
        parts[-1].append((k, v))
    return parts


def statement_segments(
        sql: str) -> tuple[list[tuple[int, int]], set[str]] | None:
    """For a ``WITH`` statement: the character spans of each CTE body
    and of the final query, plus the set of lower-cased CTE names.
    None when the statement isn't a WITH, is ``WITH RECURSIVE``, or the
    clause structure can't be delimited with certainty.

    Why it exists: the reference's compliance packs are CTE-shaped SQL
    whose bodies carry the selective fact-table predicates — DuckDB
    prunes row groups inside CTE bodies for free (internal/db). Each
    span is a self-contained SELECT, so the engine can run the SAME
    single-table/inner-join extraction per span and prune each
    reference independently (two spans reading one table with
    different predicates each get their own pruned view). CTE names
    are returned so callers exclude them from warehouse attribution —
    a CTE shadows a registered view of the same name."""
    try:
        toks, spans = _tokens_spans(sql)
    except _Unparseable:
        return None
    if not toks or toks[0] != ("kw", "WITH"):
        return None
    i = 1
    # `WITH RECURSIVE name AS (` — iterative semantics, never pruned
    # from text. (`WITH recursive AS (` is a CTE literally named
    # "recursive": toks[2] is then AS, not an identifier.)
    if (i + 2 < len(toks) and toks[i][0] == "ident"
            and toks[i][1].upper() == "RECURSIVE"
            and toks[i + 1][0] in ("ident", "bq")
            and toks[i + 2] == ("kw", "AS")):
        return None
    names: set[str] = set()
    segs: list[tuple[int, int]] = []
    while True:
        if i >= len(toks) or toks[i][0] not in ("ident", "bq"):
            return None
        names.add(_unquote_ident(toks[i]).lower())
        i += 1
        if i < len(toks) and toks[i] == ("punc", "("):
            # optional column alias list: skip to its close
            depth = 0
            while i < len(toks):
                if toks[i] == ("punc", "("):
                    depth += 1
                elif toks[i] == ("punc", ")"):
                    depth -= 1
                    if depth == 0:
                        i += 1
                        break
                i += 1
            else:
                return None
        if i >= len(toks) or toks[i] != ("kw", "AS"):
            return None
        i += 1
        if i >= len(toks) or toks[i] != ("punc", "("):
            return None
        open_idx = i
        depth = 0
        while i < len(toks):
            if toks[i] == ("punc", "("):
                depth += 1
            elif toks[i] == ("punc", ")"):
                depth -= 1
                if depth == 0:
                    break
            i += 1
        if i >= len(toks):
            return None  # unbalanced
        # body span: just inside the parens
        segs.append((spans[open_idx][1], spans[i][0]))
        i += 1
        if i < len(toks) and toks[i] == ("punc", ","):
            i += 1
            continue
        break
    if i >= len(toks):
        return None  # WITH with no final query
    segs.append((spans[i][0], len(sql)))
    return segs, names


def set_operator_spans(sql: str) -> list[tuple[int, int]] | None:
    """Character spans of each BRANCH of a depth-0 set-operator
    statement — ``A UNION [ALL|DISTINCT] B``, ``INTERSECT``,
    ``EXCEPT``, ``MINUS`` — so the engine can run the extraction
    cascade per branch exactly as it does per CTE body. None when the
    statement has no depth-0 set operator or the branch structure
    can't be delimited with certainty (the caller then treats the
    whole statement as one span — the pre-split behavior).

    Soundness: pruning a branch with conjuncts of its OWN WHERE
    preserves that branch's exact result (files are dropped only when
    they provably contain no rows satisfying the branch's predicate),
    and UNION/INTERSECT/EXCEPT of exact branch results is exact —
    so each branch is as independently prunable as a CTE body. This
    closes the last ungoverned statement shape (r9 verdict #1): the
    reference's own ``all_cloud_resources`` view
    (internal/db/unified_schema.go:432-462) and its compliance
    pass∪fail idiom are UNION ALL over per-provider tables, and each
    arm of a UNION over a 100 TB table must be admission-controlled
    like any bare scan.

    A fully parenthesized branch (``(SELECT …) UNION (SELECT …)``)
    is reported INSIDE its parens so the branch text parses — and
    rewrites — as a plain SELECT (``table_ref_edits`` only touches
    depth-0 FROM/JOIN refs). ``MINUS`` is not a reserved word in the
    lexer, so an identifier spelled ``minus`` only separates when
    followed by a SELECT head — a column named minus never splits.
    A trailing ``ORDER BY``/``LIMIT`` (which binds to the whole set
    statement) stays inside the last branch's span: harmless for
    WHERE extraction, and the rewrite only edits table refs."""
    try:
        toks, spans = _tokens_spans(sql)
    except _Unparseable:
        return None
    seps: list[tuple[int, int]] = []  # (sep_tok_idx, branch_start_idx)
    depth = 0
    for i, (k, v) in enumerate(toks):
        if (k, v) == ("punc", "("):
            depth += 1
        elif (k, v) == ("punc", ")"):
            depth -= 1
        elif depth == 0 and (
                (k == "kw" and v in ("UNION", "INTERSECT", "EXCEPT"))
                or (k == "ident" and v.upper() == "MINUS")):
            j = i + 1
            if (j < len(toks) and toks[j][0] == "ident"
                    and toks[j][1].upper() in ("ALL", "DISTINCT")):
                j += 1
            # the right branch must head with SELECT, directly or
            # inside parens — this also keeps Spark 4's
            # ``SELECT * EXCEPT (col, …) FROM t`` column-exclusion
            # syntax from reading as a set operator
            head_ok = False
            if j < len(toks) and toks[j] == ("kw", "SELECT"):
                head_ok = True
            elif (j + 1 < len(toks) and toks[j][0] == "ident"
                    and toks[j][1].upper() == "TABLE"
                    and toks[j + 1][0] in ("ident", "bq")):
                head_ok = True  # `UNION TABLE t` — a whole-table read
            elif j < len(toks) and toks[j] == ("punc", "("):
                jj = j
                while jj < len(toks) and toks[jj] == ("punc", "("):
                    jj += 1
                head_ok = jj < len(toks) and (
                    toks[jj] == ("kw", "SELECT")
                    or (jj + 1 < len(toks) and toks[jj][0] == "ident"
                        and toks[jj][1].upper() == "TABLE"
                        and toks[jj + 1][0] in ("ident", "bq")))
            if not head_ok:
                if k == "ident":
                    continue  # a column named minus, not a separator
                if (v == "EXCEPT" and j < len(toks)
                        and toks[j] == ("punc", "(")):
                    continue  # star-EXCEPT column list, not a set op
                return None  # UNION VALUES/TABLE …: can't segment
            if i == 0:
                return None  # separator with no left branch
            seps.append((i, j))
    if not seps:
        return None
    out: list[tuple[int, int]] = []
    start_idx = 0
    for sep_idx, nxt_idx in seps:
        out.append((spans[start_idx][0], spans[sep_idx - 1][1]))
        start_idx = nxt_idx
    out.append((spans[start_idx][0], spans[-1][1]))
    # unwrap parenthesized branches (loop: double parens). A branch
    # whose leading paren group is followed only by statement-tail
    # clauses (`(SELECT …) ORDER BY a LIMIT 5` — the tail binds to
    # the whole set statement) shrinks to the paren BODY: the tail
    # stays outside every span (never rewritten), and pruning the
    # body preserves its exact result regardless of the tail. Guard:
    # never shrink past a tail containing FROM/JOIN — that would be
    # a table read escaping governance.
    unwrapped: list[tuple[int, int]] = []
    for bs, be in out:
        while True:
            try:
                btoks, bspans = _tokens_spans(sql[bs:be])
            except _Unparseable:
                break
            if len(btoks) >= 2 and btoks[0] == ("punc", "("):
                depth = 0
                close = None
                for idx, t in enumerate(btoks):
                    if t == ("punc", "("):
                        depth += 1
                    elif t == ("punc", ")"):
                        depth -= 1
                        if depth == 0:
                            close = idx
                            break
                # only a DEPTH-0 FROM/JOIN in the tail blocks the
                # shrink (`(SELECT …) JOIN t2 ON …` — t2 would drop
                # out of the span and escape the loose-ref governor);
                # a FROM inside tail parens (a scalar subquery in
                # ORDER BY) is invisible to every resolver whether we
                # shrink or not, so it must not block governing the
                # branch body's tables
                tail_read = False
                d = 0
                for t in (btoks[close + 1:] if close is not None else []):
                    if t == ("punc", "("):
                        d += 1
                    elif t == ("punc", ")"):
                        d -= 1
                    elif d == 0 and t in (("kw", "FROM"), ("kw", "JOIN")):
                        tail_read = True
                        break
                if close is not None and not tail_read:
                    bs, be = bs + bspans[0][1], bs + bspans[close][0]
                    continue
            break
        unwrapped.append((bs, be))
    return unwrapped


def loose_table_refs(sql: str) -> list[tuple[str, str | None]]:
    """Best-effort depth-0 table references in FROM/JOIN position,
    INCLUDING shapes ``join_chain_tables`` refuses — comma lists,
    RIGHT/FULL/CROSS/NATURAL join members — as ``[(table,
    alias|None), …]``. For the GOVERNOR/ESTIMATOR only, never for
    pruning or rewriting: per-table predicate attribution is unsound
    in these shapes (a member may be null-extended), but every name
    returned is a whole-table read the statement will perform, so it
    must surface as a bare full-scan row for admission control (r9
    verdict #1: ``FROM a, b`` and RIGHT/FULL members executed both
    unpruned AND ungoverned). Function calls in table position
    (``FROM unnest(…)``) and db-qualified names are skipped; missing
    a ref degrades to today's behavior (ungoverned), never to a
    wrong result. Empty list on unparseable text."""
    try:
        toks = _tokens(sql)
    except _Unparseable:
        return []
    out: list[tuple[str, str | None]] = []
    depth = 0
    i, n = 0, len(toks)

    def _ref(j: int) -> tuple[str, str | None, int] | None:
        if j >= n or toks[j][0] not in ("ident", "bq"):
            return None
        if j + 1 < n and toks[j + 1] == ("punc", "("):
            return None  # table function, not a table ref
        if j + 1 < n and toks[j + 1] == ("punc", "."):
            return None  # db-qualified — not a registered view
        table = _unquote_ident(toks[j])
        j += 1
        alias = None
        if j < n and toks[j] == ("kw", "AS"):
            if j + 1 < n and toks[j + 1][0] in ("ident", "bq"):
                alias = _unquote_ident(toks[j + 1])
                j += 2
        elif j < n and toks[j][0] in ("ident", "bq"):
            alias = _unquote_ident(toks[j])
            j += 1
        return table, alias, j

    def _balanced(j: int) -> int | None:
        """Index just past the balanced paren group opening at j."""
        d = 0
        while j < n:
            if toks[j] == ("punc", "("):
                d += 1
            elif toks[j] == ("punc", ")"):
                d -= 1
                if d == 0:
                    return j + 1
            j += 1
        return None

    def _skip_item(j: int) -> int | None:
        """Advance past one NON-REF table-position item — a derived
        table ``(SELECT …)``, a table function ``unnest(x)``, or a
        db-qualified name — plus its optional alias, so LATER
        comma-list members still surface as governed reads (r10
        advice: ``FROM unnest(x) u, b`` returned [] and b stayed
        ungoverned). None when the shape is unrecognizable (the
        caller degrades to ungoverned, exactly as before)."""
        if j >= n:
            return None
        if toks[j] == ("punc", "("):
            j = _balanced(j)
        elif toks[j][0] in ("ident", "bq"):
            j += 1
            while (j + 1 < n and toks[j] == ("punc", ".")
                   and toks[j + 1][0] in ("ident", "bq")):
                j += 2  # dotted tail: db.schema.table
            if j < n and toks[j] == ("punc", "("):
                j = _balanced(j)  # table function call
        else:
            return None
        if j is None:
            return None
        if (j < n and toks[j] == ("kw", "AS") and j + 1 < n
                and toks[j + 1][0] in ("ident", "bq")):
            j += 2
        elif j < n and toks[j][0] in ("ident", "bq"):
            j += 1  # bare alias
        return j

    while i < n:
        k, v = toks[i]
        if (k, v) == ("punc", "("):
            depth += 1
        elif (k, v) == ("punc", ")"):
            depth -= 1
        elif depth == 0 and k == "kw" and v in ("FROM", "JOIN"):
            r = _ref(i + 1)
            j: int | None
            if r is not None:
                out.append((r[0], r[1]))
                j = r[2]
            else:
                # non-ident first item (derived table, unnest(...),
                # db-qualified): skip it so subsequent comma members
                # are still surfaced (skipped groups are balanced, so
                # jumping past them leaves depth-0 tracking intact)
                j = _skip_item(i + 1)
            if j is not None:
                # comma list: FROM a, b, c (and alias forms)
                while (v == "FROM" and j < n
                       and toks[j] == ("punc", ",")):
                    r = _ref(j + 1)
                    if r is not None:
                        out.append((r[0], r[1]))
                        j = r[2]
                    else:
                        j2 = _skip_item(j + 1)
                        if j2 is None:
                            break
                        j = j2
                i = j
                continue
        elif (i == 0 and k == "ident" and v.upper() == "TABLE"):
            # `TABLE t` — Spark's whole-table statement (an allowed
            # read-only start, and a set-operator branch head): a
            # full scan with no FROM for the resolvers to find.
            # Position 0 only: anywhere else `table` is a column or
            # alias named table.
            r = _ref(i + 1)
            if r is not None:
                out.append((r[0], r[1]))
                i = r[2]
                continue
        i += 1
    return out


def derived_table_spans(sql: str) -> list[tuple[int, int]]:
    """Character spans of depth-1 DERIVED-TABLE bodies: a
    parenthesized SELECT sitting in table position — directly after
    ``FROM`` or ``JOIN`` at paren depth 0 — i.e. the
    ``FROM (SELECT … WHERE …) t`` shape, the other common way users
    write the reference's compliance-pack CTE pattern. Each body is a
    self-contained SELECT, so the engine can run the same extraction
    cascade on it that it runs on CTE bodies (identical soundness
    argument: the full statement still executes on top, pruning can
    only cost I/O). Depth-1 only — a derived table nested inside
    another derived table is left to that body's own (un)parsability.
    ``LATERAL (SELECT …)`` never matches (LATERAL sits between the
    keyword and the paren), so correlated subqueries — whose rows
    depend on outer columns — are structurally excluded. Empty list
    when there are none or the text can't be tokenized/balanced."""
    try:
        toks, spans = _tokens_spans(sql)
    except _Unparseable:
        return []
    out: list[tuple[int, int]] = []
    depth = 0
    i, n = 0, len(toks)
    while i < n:
        k, v = toks[i]
        if (k, v) == ("punc", "("):
            depth += 1
        elif (k, v) == ("punc", ")"):
            depth -= 1
        elif (depth == 0 and k == "kw" and v in ("FROM", "JOIN")
                and i + 2 < n and toks[i + 1] == ("punc", "(")
                and toks[i + 2] == ("kw", "SELECT")):
            d = 0
            j = i + 1
            while j < n:
                if toks[j] == ("punc", "("):
                    d += 1
                elif toks[j] == ("punc", ")"):
                    d -= 1
                    if d == 0:
                        break
                j += 1
            if j >= n:
                return []  # unbalanced parens: stand down entirely
            out.append((spans[i + 1][1], spans[j][0]))
            i = j + 1  # the whole body is skipped; depth unchanged
            continue
        i += 1
    return out


def rewrite_table_refs(sql: str, mapping: dict[str, str]) -> str | None:
    """Rewrite the depth-0 FROM/JOIN table references whose lower-cased
    name is a ``mapping`` key to the mapped view name, appending
    ``AS <original>`` when the reference carries no alias so qualified
    column refs (``estate.col``) keep resolving against the new view.

    The safe substitute for re-pointing a SHARED temp view at a pruned
    read: the engine registers the pruned DataFrame under a UNIQUE
    generated name and rewrites only this statement's reference to it,
    so a concurrent query on the same SparkSession can never resolve
    the shared view mid-swap and silently read a subset pruned for a
    different predicate.

    Only meaningful for statements ``single_table``/``inner_join_tables``
    accept — those gates guarantee exactly one FROM, no subqueries, no
    ``EXTRACT(x FROM y)``, no comma lists, so every depth-0 FROM/JOIN is
    followed by a real table reference. Callers must gate on them first;
    returns None when the text can't be tokenized or no reference was
    rewritten (treat as 'do not rewrite')."""
    edits = table_ref_edits(sql, mapping)
    if not edits:
        return None
    out = sql
    for start, end, repl in reversed(edits):
        out = out[:start] + repl + out[end:]
    return out


def table_ref_edits(sql: str, mapping: dict[str, str]
                    ) -> list[tuple[int, int, str]] | None:
    """The edit list behind ``rewrite_table_refs``: ``(start, end,
    replacement)`` per rewritten depth-0 FROM/JOIN reference, offsets
    into ``sql``. Exposed separately so the engine can compute edits
    against a length-preserving MASKED copy of a statement (subquery
    bodies blanked out) and splice them into the ORIGINAL text — the
    masked copy shares every token offset outside the masked ranges,
    and a depth-0 table ref can never sit inside one."""
    try:
        toks, spans = _tokens_spans(sql)
    except _Unparseable:
        return None
    edits: list[tuple[int, int, str]] = []  # (start, end, replacement)
    depth = 0
    for i, (k, v) in enumerate(toks):
        if (k, v) == ("punc", "("):
            depth += 1
        elif (k, v) == ("punc", ")"):
            depth -= 1
        if depth != 0 or k != "kw" or v not in ("FROM", "JOIN"):
            continue
        j = i + 1
        if j >= len(toks) or toks[j][0] not in ("ident", "bq"):
            continue
        name = _unquote_ident(toks[j]).lower()
        target = mapping.get(name)
        if target is None:
            continue
        # alias present? `AS x` or a bare identifier right after — a
        # keyword (WHERE/JOIN/ON/...) is kind "kw", so it never reads
        # as an alias here
        has_alias = (
            (j + 1 < len(toks) and toks[j + 1] == ("kw", "AS"))
            or (j + 1 < len(toks) and toks[j + 1][0] in ("ident", "bq"))
        )
        repl = target if has_alias else f"{target} AS {toks[j][1]}"
        edits.append((spans[j][0], spans[j][1], repl))
    return edits or None


def subquery_spans(sql: str) -> list[tuple[int, int, int, int]]:
    """``(mask_start, body_start, body_end, mask_end)`` per OUTERMOST
    ``EXISTS ( SELECT … )`` / ``IN ( SELECT … )`` subquery:
    ``mask_start..mask_end`` covers the EXISTS/IN keyword through the
    closing paren (the range ``mask_subqueries`` blanks so the
    ENCLOSING statement parses as subquery-free), ``body_start..
    body_end`` is the self-contained SELECT just inside the parens
    (its own extractable span — the compliance-pack ``WHERE EXISTS
    (SELECT 1 FROM big WHERE …)`` idiom carries the fact table's
    selective predicates there). Outermost only: the scan jumps past
    each body, so a nested subquery is reported by a ``subquery_spans``
    call on THAT body's text, not here. A preceding NOT is left
    outside the range on purpose — ``NOT <mask>`` is an unparseable
    conjunct the splitters skip, exactly like the mask itself.
    Scalar subqueries (a bare parenthesized SELECT with no EXISTS/IN
    head) are NOT matched: their enclosing statement keeps its extra
    FROM and the resolvers stand down, same as before. Empty list
    when there are none or the text can't be tokenized/balanced."""
    try:
        toks, spans = _tokens_spans(sql)
    except _Unparseable:
        return []
    out: list[tuple[int, int, int, int]] = []
    i, n = 0, len(toks)
    while i < n:
        k, v = toks[i]
        # tolerate redundant wrapping parens (`IN ((SELECT …))`) —
        # the body span stays just inside the FIRST paren; the
        # engine strips the extra layer from the body text before
        # resolving it (r10 review: the double-paren spelling was
        # not recognized as a subquery at all)
        head = (k == "kw" and v in ("EXISTS", "IN") and i + 1 < n
                and toks[i + 1] == ("punc", "("))
        if head:
            j2 = i + 2
            while j2 < n and toks[j2] == ("punc", "("):
                j2 += 1
            head = j2 < n and toks[j2] == ("kw", "SELECT")
        if head:
            d = 0
            j = i + 1
            while j < n:
                if toks[j] == ("punc", "("):
                    d += 1
                elif toks[j] == ("punc", ")"):
                    d -= 1
                    if d == 0:
                        break
                j += 1
            if j >= n:
                return []  # unbalanced parens: stand down entirely
            out.append((spans[i][0], spans[i + 1][1],
                        spans[j][0], spans[j][1]))
            i = j + 1
            continue
        i += 1
    return out


def enclosing_paren_span(sql: str) -> tuple[int, int]:
    """Character span of ``sql``'s content after removing balanced
    ENCLOSING paren layers (repeatedly); ``(0, len(sql))`` when there
    are none or the text can't be tokenized. The span analogue of
    ``_strip_enclosing_parens``: the engine shrinks a subquery BODY's
    region with it (`IN ((SELECT …))` — the wrapping layer would
    otherwise stand every resolver down), and offsets stay valid in
    the original text because only a prefix/suffix is dropped."""
    try:
        toks, spans = _tokens_spans(sql)
    except _Unparseable:
        return 0, len(sql)
    if not toks:
        return 0, len(sql)
    a, b = 0, len(toks) - 1
    while (b - a >= 1 and toks[a] == ("punc", "(")
           and toks[b] == ("punc", ")")):
        depth = 0
        ok = True
        for idx in range(a, b + 1):
            t = toks[idx]
            if t == ("punc", "("):
                depth += 1
            elif t == ("punc", ")"):
                depth -= 1
                if depth == 0 and idx != b:
                    ok = False
                    break
        if not ok:
            break
        a += 1
        b -= 1
    if a == 0:
        return 0, len(sql)
    return spans[a][0], spans[b][1]


def mask_subqueries(sql: str, ranges: list[tuple[int, int]]) -> str:
    """Length-preserving blank-out of the given character ranges: each
    becomes `` 0`` padded with spaces. The replacement tokenizes as a
    bare numeric term, which ``_parse_term`` rejects — so the masked
    subquery conjunct contributes nothing while its SIBLING conjuncts
    still extract, and the resolvers no longer see the subquery's
    FROM/EXISTS (which would otherwise stand them down). Length
    preservation is the point: every token offset outside the masked
    ranges is identical in masked and original text, so rewrite edits
    computed on the mask splice cleanly into the original."""
    out = sql
    for s, e in ranges:
        out = out[:s] + " 0" + " " * (e - s - 2) + out[e:]
    return out


def extract_disjuncts(sql: str, table: str,
                      alias: str | None = None,
                      qualified_only: bool = False
                      ) -> list[list[tuple]] | None:
    """DNF extraction for a WHERE whose TOP level is an OR: each
    disjunct's simple conjuncts in ``skipping`` predicate form, for
    ``plan_skip_any``. None unless there are >= 2 disjuncts and EVERY
    disjunct yields at least one conjunct — an unparsed disjunct could
    match anything, so pruning with the others alone would drop its
    rows' files. (Within a disjunct, a subset of its conjuncts is
    still sound, exactly as in ``extract_predicates``.)"""
    try:
        toks = _tokens(sql)
    except _Unparseable:
        return None
    names = {(alias or table).lower()}
    where = _where_tokens(toks)
    if not where:
        return None
    where = _collapse_case(where)
    if where is None:
        return None
    parts = _split_disjuncts(_strip_enclosing_parens(where))
    if len(parts) < 2:
        return None
    out: list[list[tuple]] = []
    for part in parts:
        part = _strip_enclosing_parens(part)
        conjuncts = _split_conjuncts(part)
        if conjuncts is None:
            return None  # nested OR inside the disjunct: stand down
        branch = [p for p in (
            _parse_term(term, names, qualified_only)
            for term in conjuncts) if p is not None]
        if not branch:
            return None  # this disjunct is unconstrained: no pruning
        out.append(branch)
    return out
