"""KQL (Kusto) subset → Spark DataFrame translator.

The reference pushes raw KQL strings to Azure Resource Graph
(``plugins/azure-provider/resource_graph.go``): its shipped queries use
``project`` (:71-78), ``where`` (:152-165,225-259), ``summarize count()/
any()/make_set() by`` (:83-110), ``extend`` with ``split(type,'/')[i]``
(:93-96) / ``extract`` / ``extract_all`` (:134-137), ``mv-expand``
(:136), ``join kind=leftouter`` (:268-280), ``order by``/``limit``
(:74,118) and tag lookups ``tags['k'] == 'v'`` (:243-250).  This module
parses that dialect subset and compiles it onto DataFrames, so the
reference's verbatim query strings run anywhere — no ARG service — the
same way the compliance dialect shim runs its DuckDB pack SQL verbatim.

Spark-first: every stage compiles to declarative DataFrame ops (filter /
select / groupBy / explode / join), so Catalyst still performs pushdown,
pruning and join planning on the translated plan; no UDFs, no driver
loops.

Documented determinism/semantics choices (KQL leaves them loose):
* ``make_set`` returns a *sorted* array (KQL/Spark set order is
  engine-dependent; sorting makes results hash-comparable).
* ``order by`` defaults to **descending**, per KQL. Spark's null
  placement (asc→first, desc→last) matches Kusto's.
* ``contains`` / ``startswith`` / ``endswith`` / ``=~`` / ``has`` are
  case-insensitive, per KQL. ``has`` matches a whole alphanumeric term.
* ``mv-expand`` drops rows whose array is null/empty (ARG behavior for
  the reference's usage, which always guards with ``array_length > 0``).
* ``join`` right-side columns that clash with left names get a ``1``
  suffix, mirroring Kusto's ``col1`` rename.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["kql_to_df", "KqlError"]


class KqlError(ValueError):
    """Raised for syntax or unsupported-feature errors, with position."""


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<vstring>@'(?:[^'])*'|@"(?:[^"])*")          # verbatim string, no escapes
  | (?P<string>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*") # quoted string, \-escapes
  | (?P<datetime>datetime\(\s*[0-9][^)'"]*\))       # unquoted KQL datetime literal
  | (?P<number>\d+\.\d+|\d+)
  | (?P<ident>[$A-Za-z_][A-Za-z0-9_]*)
  | (?P<bangword>![a-z_]+)                          # !contains, !in, ...
  | (?P<op>==|!=|=~|!~|<=|>=|[|,()\[\]=<>+\-*/%.])
    """,
    re.VERBOSE,
)

_KEYWORD_OPS = {
    "and", "or", "not", "contains", "startswith", "endswith", "has", "in",
    "asc", "desc", "by", "on", "kind",
}


@dataclass
class _Tok:
    kind: str  # 'string' | 'number' | 'ident' | 'op'
    text: str
    pos: int


def _tokenize(s: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i = 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise KqlError(f"KQL: cannot tokenize at position {i}: {s[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "vstring":
            toks.append(_Tok("string", text[2:-1], m.start()))
        elif kind == "datetime":
            toks.append(_Tok("datetime", text[text.index("(") + 1:-1].strip(),
                             m.start()))
        elif kind == "string":
            body = text[1:-1]
            body = re.sub(r"\\(.)", lambda g: g.group(1), body)
            toks.append(_Tok("string", body, m.start()))
        elif kind == "bangword":
            toks.append(_Tok("op", text, m.start()))
        elif kind == "ident":
            toks.append(_Tok("ident", text, m.start()))
        else:
            toks.append(_Tok(kind, text, m.start()))
    return toks


# ---------------------------------------------------------------------------
# Expression parser (precedence climbing) → Column
# ---------------------------------------------------------------------------

def _lower_eq(a: Column, b: Column) -> Column:
    return F.lower(a.cast("string")) == F.lower(b.cast("string"))


class _ExprParser:
    """Parses one KQL scalar/aggregate expression from a token stream."""

    def __init__(self, toks: list[_Tok], start: int = 0):
        self.toks = toks
        self.i = start

    # -- stream helpers ------------------------------------------------------
    def peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> _Tok:
        t = self.peek()
        if t is None:
            raise KqlError("KQL: unexpected end of expression")
        self.i += 1
        return t

    def accept(self, text: str) -> bool:
        t = self.peek()
        if t is not None and t.kind == "op" and t.text == text:
            self.i += 1
            return True
        return False

    def expect(self, text: str) -> None:
        t = self.next()
        if t.kind != "op" or t.text != text:
            raise KqlError(f"KQL: expected {text!r}, got {t.text!r} at {t.pos}")

    # -- grammar -------------------------------------------------------------
    def parse(self) -> Column:
        return self.or_expr()

    def or_expr(self) -> Column:
        left = self.and_expr()
        while self._kw("or"):
            left = left | self.and_expr()
        return left

    def and_expr(self) -> Column:
        left = self.not_expr()
        while self._kw("and"):
            left = left & self.not_expr()
        return left

    def not_expr(self) -> Column:
        if self._kw("not"):
            return ~self.not_expr()
        return self.cmp_expr()

    def _kw(self, word: str) -> bool:
        t = self.peek()
        if t is not None and t.kind == "ident" and t.text.lower() == word:
            self.i += 1
            return True
        return False

    def cmp_expr(self) -> Column:
        left = self.add_expr()
        t = self.peek()
        if t is None:
            return left
        op = t.text.lower() if t.kind in ("op", "ident") else None
        if op in ("==", "!=", "<", ">", "<=", ">="):
            self.i += 1
            right = self.add_expr()
            return {
                "==": left == right, "!=": left != right,
                "<": left < right, ">": left > right,
                "<=": left <= right, ">=": left >= right,
            }[op]
        if op in ("=~", "!~"):
            self.i += 1
            right = self.add_expr()
            eq = _lower_eq(left, right)
            return eq if op == "=~" else ~eq
        if op in ("contains", "!contains", "startswith", "!startswith",
                  "endswith", "!endswith", "has", "!has"):
            self.i += 1
            right = self.add_expr()
            base = op.lstrip("!")
            if base == "contains":
                res = F.instr(F.lower(left.cast("string")),
                              F.lower(right.cast("string"))) > 0
            elif base == "startswith":
                res = F.startswith(F.lower(left.cast("string")),
                                   F.lower(right.cast("string")))
            elif base == "endswith":
                res = F.endswith(F.lower(left.cast("string")),
                                 F.lower(right.cast("string")))
            else:  # has: whole-term match, term = alphanumeric run
                res = F.regexp_like(
                    F.lower(left.cast("string")),
                    F.concat(F.lit(r"(^|[^a-z0-9])"),
                             _regex_quote(F.lower(right.cast("string"))),
                             F.lit(r"($|[^a-z0-9])")))
            return ~res if op.startswith("!") else res
        if op == "in" or op == "!in":
            self.i += 1
            self.expect("(")
            vals = [self.literal_value()]
            while self.accept(","):
                vals.append(self.literal_value())
            self.expect(")")
            res = left.isin(vals)
            return ~res if op == "!in" else res
        return left

    def literal_value(self):
        t = self.next()
        if t.kind == "string":
            return t.text
        if t.kind == "number":
            return float(t.text) if "." in t.text else int(t.text)
        raise KqlError(f"KQL: expected literal in list at {t.pos}")

    def add_expr(self) -> Column:
        left = self.mul_expr()
        while True:
            t = self.peek()
            if t is not None and t.kind == "op" and t.text in ("+", "-"):
                self.i += 1
                right = self.mul_expr()
                left = left + right if t.text == "+" else left - right
            else:
                return left

    def mul_expr(self) -> Column:
        left = self.unary()
        while True:
            t = self.peek()
            if t is not None and t.kind == "op" and t.text in ("*", "/", "%"):
                self.i += 1
                right = self.unary()
                left = {"*": left * right, "/": left / right,
                        "%": left % right}[t.text]
            else:
                return left

    def unary(self) -> Column:
        if self.accept("-"):
            return -self.unary()
        return self.postfix()

    def postfix(self) -> Column:
        col = self.primary()
        while True:
            t = self.peek()
            if t is not None and t.kind == "op" and t.text == "[":
                self.i += 1
                idx = self.next()
                # try_element_at: null on out-of-range / missing key (KQL
                # semantics), even under ANSI mode. 1-based, hence the +1.
                if idx.kind == "number" and "." not in idx.text:
                    col = F.try_element_at(col, F.lit(int(idx.text) + 1))
                elif idx.kind == "string":
                    col = F.try_element_at(col, F.lit(idx.text))
                else:
                    raise KqlError(f"KQL: only literal indexes supported at {idx.pos}")
                self.expect("]")
            elif t is not None and t.kind == "op" and t.text == ".":
                self.i += 1
                fld = self.next()
                if fld.kind != "ident":
                    raise KqlError(f"KQL: expected field name at {fld.pos}")
                col = col[fld.text]
            else:
                return col

    def primary(self) -> Column:
        t = self.next()
        if t.kind == "datetime":
            return F.lit(t.text).cast("timestamp")
        if t.kind == "string":
            return F.lit(t.text)
        if t.kind == "number":
            return F.lit(float(t.text) if "." in t.text else int(t.text))
        if t.kind == "op" and t.text == "(":
            inner = self.or_expr()
            self.expect(")")
            return inner
        if t.kind == "ident":
            low = t.text.lower()
            if low == "true":
                return F.lit(True)
            if low == "false":
                return F.lit(False)
            nxt = self.peek()
            if nxt is not None and nxt.kind == "op" and nxt.text == "(":
                self.i += 1
                args: list[Column] = []
                raw: list[_Tok | None] = []
                if not self.accept(")"):
                    while True:
                        raw.append(self.peek())
                        args.append(self.or_expr())
                        if not self.accept(","):
                            break
                    self.expect(")")
                return _call(low, args, raw, t.pos)
            return F.col(t.text)
        raise KqlError(f"KQL: unexpected token {t.text!r} at {t.pos}")


def _regex_quote(c: Column) -> Column:
    """Escape regex metacharacters in a column value (for rlike building)."""
    return F.regexp_replace(c, F.lit(r"([.^$*+?()\[\]{}|\\])"), F.lit(r"\\$1"))


def _lit_str(tok: _Tok | None) -> str | None:
    return tok.text if tok is not None and tok.kind == "string" else None


def _call(name: str, args: list[Column], raw: list[_Tok | None], pos: int) -> Column:
    """Compile a KQL function call. `raw` holds the first token of each arg
    (so literal-only contracts — regexes, delimiters — can be enforced)."""
    n = len(args)
    if name == "count" and n == 0:
        return F.count(F.lit(1))
    if name == "countif" and n == 1:
        return F.sum(F.when(args[0], 1).otherwise(0))
    if name == "dcount" and n == 1:
        return F.count_distinct(args[0])
    if name in ("sum", "avg", "min", "max") and n == 1:
        return getattr(F, name)(args[0])
    if name == "any" and n == 1:
        return F.first(args[0], ignorenulls=True)
    if name == "make_list" and n == 1:
        return F.collect_list(args[0])
    if name == "make_set" and n in (1, 2):
        s = F.array_sort(F.collect_set(args[0]))  # sorted: deterministic
        if n == 2:
            cap = raw[1]
            if cap is None or cap.kind != "number":
                raise KqlError(f"KQL: make_set cap must be a literal at {pos}")
            s = F.slice(s, 1, int(cap.text))
        return s
    if name == "split" and n == 2:
        delim = _lit_str(raw[1])
        if delim is None:
            raise KqlError(f"KQL: split() delimiter must be a literal at {pos}")
        return F.split(args[0].cast("string"), re.escape(delim))
    if name == "extract" and n == 3:
        pat = _lit_str(raw[0])
        grp = raw[1]
        if pat is None or grp is None or grp.kind != "number":
            raise KqlError(f"KQL: extract(regex, group, text) literals required at {pos}")
        got = F.regexp_extract(args[2].cast("string"), pat, int(grp.text))
        return F.when(got != "", got)  # KQL yields null on no-match, not ''
    if name == "extract_all" and n == 2:
        pat = _lit_str(raw[0])
        if pat is None:
            raise KqlError(f"KQL: extract_all(regex, text) literal regex required at {pos}")
        # KQL: with a capture group, returns the group; else whole matches.
        grp = 1 if re.compile(pat).groups >= 1 else 0
        return F.regexp_extract_all(args[1].cast("string"), F.lit(pat), grp)
    if name == "tostring" and n == 1:
        return args[0].cast("string")
    if name in ("toint", "tolong", "todouble", "tobool") and n == 1:
        return args[0].cast({"toint": "int", "tolong": "long",
                             "todouble": "double", "tobool": "boolean"}[name])
    if name in ("tolower", "toupper", "trim", "abs", "floor", "round") and n == 1:
        fn = {"tolower": F.lower, "toupper": F.upper, "trim": F.trim,
              "abs": F.abs, "floor": F.floor, "round": F.round}[name]
        return fn(args[0])
    if name == "round" and n == 2:
        return F.round(args[0], int(raw[1].text))
    if name == "ceiling" and n == 1:
        return F.ceil(args[0])
    if name == "strlen" and n == 1:
        return F.length(args[0].cast("string"))
    if name == "strcat":
        return F.concat(*[a.cast("string") for a in args])
    if name == "substring" and n in (2, 3):
        start = args[1] + 1  # KQL 0-based → SQL 1-based
        if n == 2:
            return F.substring(args[0].cast("string"), start, F.lit(1 << 30))
        return F.substring(args[0].cast("string"), start, args[2])
    if name == "replace_string" and n == 3:
        return F.replace(args[0].cast("string"), args[1].cast("string"),
                         args[2].cast("string"))
    if name == "array_length" and n == 1:
        return F.size(args[0])
    if name == "isnotempty" and n == 1:
        return args[0].isNotNull() & (args[0].cast("string") != "")
    if name == "isempty" and n == 1:
        return args[0].isNull() | (args[0].cast("string") == "")
    if name == "isnull" and n == 1:
        return args[0].isNull()
    if name == "isnotnull" and n == 1:
        return args[0].isNotNull()
    if name == "datetime" and n == 1:
        # quoted form datetime('2015-03-01T00:00:00Z'); string→timestamp
        # cast accepts ISO 8601 (incl. 'T'/'Z'), unlike to_timestamp's
        # fixed default pattern.
        return args[0].cast("timestamp")
    if name in ("iff", "iif") and n == 3:
        return F.when(args[0], args[1]).otherwise(args[2])
    if name == "coalesce":
        return F.coalesce(*args)
    if name == "bin" and n == 2:
        return F.floor(args[0] / args[1]) * args[1]
    if name == "startofday" and n == 1:
        return F.date_trunc("day", args[0])
    if name == "format_datetime" and n == 2:
        fmt = _lit_str(raw[1])
        if fmt is None:
            raise KqlError(f"KQL: format_datetime format must be literal at {pos}")
        return F.date_format(args[0], fmt)  # KQL yyyy/MM/dd/HH/mm/ss = Java
    raise KqlError(f"KQL: unsupported function {name}({n} args) at {pos}")


# ---------------------------------------------------------------------------
# Pipeline parsing
# ---------------------------------------------------------------------------

def _split_stages(query: str) -> list[str]:
    """Split on top-level '|' (ignoring pipes inside strings/parens)."""
    stages: list[str] = []
    depth = 0
    quote: str | None = None
    start = 0
    i = 0
    while i < len(query):
        ch = query[i]
        if quote is not None:
            if ch == "\\" and quote in "'\"" and i + 1 < len(query):
                i += 2
                continue
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "|" and depth == 0:
            stages.append(query[start:i])
            start = i + 1
        i += 1
    stages.append(query[start:])
    return [s.strip() for s in stages if s.strip()]


def _expr_name(toks: list[_Tok], start: int, end: int, fallback: str) -> str:
    """Best-effort output name for an unaliased expression: bare idents keep
    their name (incl. dotted tails), everything else gets the fallback."""
    span = toks[start:end]
    if len(span) == 1 and span[0].kind == "ident":
        return span[0].text
    if span and all(t.kind == "ident" or t.text == "." for t in span):
        return span[-1].text
    return fallback


class _StageCompiler:
    def __init__(self, tables: dict[str, DataFrame]):
        self.tables = {k.lower(): v for k, v in tables.items()}

    def compile(self, query: str) -> DataFrame:
        stages = _split_stages(query)
        if not stages:
            raise KqlError("KQL: empty query")
        head = stages[0].strip()
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", head):
            raise KqlError(f"KQL: first stage must be a table name, got {head!r}")
        if head.lower() not in self.tables:
            raise KqlError(f"KQL: unknown table {head!r} "
                           f"(have: {sorted(self.tables)})")
        df = self.tables[head.lower()]
        for stage in stages[1:]:
            df = self.apply_stage(df, stage)
        return df

    def apply_stage(self, df: DataFrame, stage: str) -> DataFrame:
        m = re.match(r"([a-z][a-z-]*)\s*(.*)", stage, re.DOTALL | re.IGNORECASE)
        if not m:
            raise KqlError(f"KQL: cannot parse stage {stage!r}")
        op = m.group(1).lower()
        rest = m.group(2)
        if op == "where":
            toks = _tokenize(rest)
            return df.filter(_ExprParser(toks).parse())
        if op == "project":
            return self._project(df, rest)
        if op == "project-away":
            cols = [c.strip() for c in rest.split(",")]
            return df.drop(*cols)
        if op == "extend":
            return self._extend(df, rest)
        if op == "summarize":
            return self._summarize(df, rest)
        if op == "mv-expand":
            return self._mv_expand(df, rest)
        if op in ("order", "sort"):
            return self._order_by(df, rest)
        if op in ("limit", "take"):
            return df.limit(int(rest.strip()))
        if op == "top":
            return self._top(df, rest)
        if op == "count":
            return df.agg(F.count(F.lit(1)).alias("Count"))
        if op == "distinct":
            if rest.strip() == "*":
                return df.distinct()
            cols = [c.strip() for c in rest.split(",")]
            return df.select(*cols).distinct()
        if op == "join":
            return self._join(df, rest)
        raise KqlError(f"KQL: unsupported operator {op!r}")

    # -- stage impls ---------------------------------------------------------
    def _project(self, df: DataFrame, rest: str) -> DataFrame:
        toks = _tokenize(rest)
        cols: list[Column] = []
        i = 0
        k = 0
        while i < len(toks):
            t = toks[i]
            name = None
            if (t.kind == "ident" and i + 1 < len(toks)
                    and toks[i + 1].kind == "op" and toks[i + 1].text == "="):
                name = t.text
                i += 2
            p = _ExprParser(toks, i)
            col = p.parse()
            if name is None:
                name = _expr_name(toks, i, p.i, f"Column{k + 1}")
            i = p.i
            cols.append(col.alias(name))
            k += 1
            if i < len(toks) and toks[i].kind == "op" and toks[i].text == ",":
                i += 1
        return df.select(*cols)

    def _extend(self, df: DataFrame, rest: str) -> DataFrame:
        toks = _tokenize(rest)
        i = 0
        while i < len(toks):
            t = toks[i]
            if t.kind != "ident" or i + 1 >= len(toks) or toks[i + 1].text != "=":
                raise KqlError(f"KQL: extend needs Name = expr at {t.pos}")
            name = t.text
            p = _ExprParser(toks, i + 2)
            df = df.withColumn(name, p.parse())
            i = p.i
            if i < len(toks) and toks[i].kind == "op" and toks[i].text == ",":
                i += 1
        return df

    def _summarize(self, df: DataFrame, rest: str) -> DataFrame:
        toks = _tokenize(rest)
        aggs: list[Column] = []
        i = 0
        k = 0
        while i < len(toks):
            t = toks[i]
            if t.kind == "ident" and t.text.lower() == "by":
                break
            name = None
            if (t.kind == "ident" and i + 1 < len(toks)
                    and toks[i + 1].kind == "op" and toks[i + 1].text == "="):
                name = t.text
                i += 2
            p = _ExprParser(toks, i)
            col = p.parse()
            if name is None:
                # KQL names a bare agg call after the function: count_, sum_x
                if (toks[i].kind == "ident" and i + 1 < len(toks)
                        and toks[i + 1].text == "("):
                    name = toks[i].text.lower() + "_"
                else:
                    name = _expr_name(toks, i, p.i, f"agg{k + 1}")
            i = p.i
            aggs.append(col.alias(name))
            k += 1
            if i < len(toks) and toks[i].kind == "op" and toks[i].text == ",":
                i += 1
        keys: list[Column] = []
        if i < len(toks):  # 'by' clause
            i += 1
            while i < len(toks):
                t = toks[i]
                name = None
                if (t.kind == "ident" and i + 1 < len(toks)
                        and toks[i + 1].kind == "op" and toks[i + 1].text == "="):
                    name = t.text
                    i += 2
                p = _ExprParser(toks, i)
                col = p.parse()
                if name is None:
                    name = _expr_name(toks, i, p.i, f"key{len(keys) + 1}")
                i = p.i
                keys.append(col.alias(name))
                if i < len(toks) and toks[i].kind == "op" and toks[i].text == ",":
                    i += 1
        if not aggs:
            aggs = [F.count(F.lit(1)).alias("count_")]
        if keys:
            return df.groupBy(*keys).agg(*aggs)
        return df.agg(*aggs)

    def _mv_expand(self, df: DataFrame, rest: str) -> DataFrame:
        toks = _tokenize(rest)
        name = None
        i = 0
        if (toks and toks[0].kind == "ident" and len(toks) > 1
                and toks[1].kind == "op" and toks[1].text == "="):
            name = toks[0].text
            i = 2
        p = _ExprParser(toks, i)
        col = p.parse()
        if name is None:
            name = _expr_name(toks, i, p.i, "value")
        return df.withColumn(name, F.explode(col))

    def _order_by(self, df: DataFrame, rest: str) -> DataFrame:
        rest = re.sub(r"^\s*by\s+", "", rest, flags=re.IGNORECASE)
        toks = _tokenize(rest)
        orders: list[Column] = []
        i = 0
        while i < len(toks):
            p = _ExprParser(toks, i)
            col = p.parse()
            i = p.i
            direction = "desc"  # KQL default
            if i < len(toks) and toks[i].kind == "ident" \
                    and toks[i].text.lower() in ("asc", "desc"):
                direction = toks[i].text.lower()
                i += 1
            orders.append(col.asc() if direction == "asc" else col.desc())
            if i < len(toks) and toks[i].kind == "op" and toks[i].text == ",":
                i += 1
        return df.orderBy(*orders)

    def _top(self, df: DataFrame, rest: str) -> DataFrame:
        m = re.match(r"\s*(\d+)\s+by\s+(.*)", rest, re.DOTALL | re.IGNORECASE)
        if not m:
            raise KqlError(f"KQL: top needs 'top N by expr', got {rest!r}")
        return self._order_by(df, m.group(2)).limit(int(m.group(1)))

    def _join(self, df: DataFrame, rest: str) -> DataFrame:
        m = re.match(
            r"\s*kind\s*=\s*([a-z]+)\s*\((.*)\)\s*on\s+(.+)$",
            rest, re.DOTALL | re.IGNORECASE)
        if not m:
            raise KqlError("KQL: join needs `join kind=<k> ( <query> ) on <key>`")
        kind = m.group(1).lower()
        how = {
            "inner": "inner", "leftouter": "left", "rightouter": "right",
            "fullouter": "full", "leftsemi": "left_semi",
            "leftanti": "left_anti",
        }.get(kind)
        if how is None:
            raise KqlError(f"KQL: unsupported join kind {kind!r}")
        right = self.compile(m.group(2).strip())
        onspec = m.group(3).strip()
        dollar = re.fullmatch(
            r"\$left\.(\w+)\s*==\s*\$right\.(\w+)", onspec)
        if dollar:
            lkey, rkey = dollar.group(1), dollar.group(2)
        elif re.fullmatch(r"\w+", onspec):
            lkey = rkey = onspec
        else:
            raise KqlError(f"KQL: unsupported join on-spec {onspec!r}")
        # Kusto renames clashing right columns with a `1` suffix.
        clashes = [c for c in right.columns
                   if c in df.columns and not (c == rkey == lkey)]
        for c in clashes:
            right = right.withColumnRenamed(c, c + "1")
        if lkey == rkey:
            out = df.join(right, on=lkey, how=how)
        else:
            out = df.join(right, df[lkey] == right[rkey], how=how)
        return out


def kql_to_df(query: str, tables: dict[str, DataFrame]) -> DataFrame:
    """Compile a KQL pipeline string onto the given named DataFrames.

    `tables` maps table names (case-insensitive) to DataFrames; the
    query's first pipeline stage must name one of them.
    """
    return _StageCompiler(tables).compile(query)
