"""OTTL-lite: compile OTTL-style statement strings to Catalyst columns.

The reference's transformation language (pkg/ottl; grammar in
pkg/ottl/grammar.go, spec pkg/ottl/LANGUAGE.md) drives the transform
processor: ``editor(args...) [where bool_expr]`` applied per record, in
order, with an error mode (pkg/ottl/parser.go:356-371). This module
re-expresses that contract Spark-first:

  * statements are parsed ONCE on the driver by a small recursive-descent
    parser (the analog of the participle parser at parser.go:236-241);
  * each statement compiles to a Column transformation — execution is
    whole-stage-codegen'd, never per-record interpretation;
  * ``where`` gating = ``F.when(cond, new).otherwise(old)`` exactly as the
    transform processor leaves non-matching records untouched;
  * error modes (config.go:14-16): ``propagate`` uses plain casts (a bad
    value fails the job), ``ignore``/``silent`` use try_-variants so bad
    values become null and flow on — the columnar analog of skipping the
    failed statement for that record.

Paths resolve against the flat transcript model: ``body`` -> text column,
``attributes["k"]``/bare identifiers -> top-level columns (SURVEY.md §1.3
maps promoted typed columns over MapType on purpose).

Supported editors (ottlfuncs/functions.go:12-26): set, delete_key,
keep_keys, replace_pattern, replace_all_patterns, truncate_all, limit,
append. Converters: see CONVERTERS below (string/math/time/hash
families, ExtractPatterns, IsMatch, ...).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["compile_statement", "apply_statements", "Statement", "CONVERTERS"]


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<number>-?\d+\.\d+|-?\d+)
  | (?P<op>==|!=|>=|<=|\+|\-|\*|/|>|<|\(|\)|\[|\]|,|\.)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)


def _tokenize(s: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise ValueError(f"OTTL syntax error at {s[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind != "ws":
            out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------

@dataclass
class Path:
    parts: list[str]  # e.g. ["attributes", "foo"] or ["body"]

    def column_name(self) -> str:
        # flat model: body -> text; attributes["k"]/resource.k -> k
        if self.parts == ["body"]:
            return "text"
        if self.parts[0] in ("attributes", "resource", "cache") and len(self.parts) > 1:
            return self.parts[-1]
        return ".".join(self.parts)


@dataclass
class Call:
    name: str
    args: list

@dataclass
class Lit:
    value: object

@dataclass
class ListExpr:
    items: list

@dataclass
class BinOp:
    op: str
    left: object
    right: object


@dataclass
class Statement:
    """One parsed `editor(args) [where cond]` statement."""

    editor: Call
    where: object | None
    text: str


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val: str):
        k, v = self.next()
        if v != val:
            raise ValueError(f"expected {val!r}, got {v!r}")

    # expr := or_expr
    def parse_expr(self):
        return self._or()

    def _or(self):
        left = self._and()
        while self.peek()[1] == "or":
            self.next()
            left = BinOp("or", left, self._and())
        return left

    def _and(self):
        left = self._not()
        while self.peek()[1] == "and":
            self.next()
            left = BinOp("and", left, self._not())
        return left

    def _not(self):
        if self.peek()[1] == "not":
            self.next()
            return Call("not", [self._not()])
        return self._cmp()

    def _cmp(self):
        left = self._add()
        if self.peek()[1] in ("==", "!=", ">", "<", ">=", "<="):
            op = self.next()[1]
            return BinOp(op, left, self._add())
        return left

    def _add(self):
        left = self._mul()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            left = BinOp(op, left, self._mul())
        return left

    def _mul(self):
        left = self._atom()
        while self.peek()[1] in ("*", "/"):
            op = self.next()[1]
            left = BinOp(op, left, self._atom())
        return left

    def _atom(self):
        kind, val = self.peek()
        if val == "(":
            self.next()
            e = self.parse_expr()
            self.expect(")")
            return e
        if val == "[":
            self.next()
            items = []
            if self.peek()[1] != "]":
                items.append(self.parse_expr())
                while self.peek()[1] == ",":
                    self.next()
                    items.append(self.parse_expr())
            self.expect("]")
            return ListExpr(items)
        if kind == "string":
            self.next()
            raw = val[1:-1]
            return Lit(raw.replace('\\"', '"').replace("\\'", "'").replace("\\\\", "\\"))
        if kind == "number":
            self.next()
            return Lit(float(val) if "." in val else int(val))
        if kind == "ident":
            self.next()
            if val == "true":
                return Lit(True)
            if val == "false":
                return Lit(False)
            if val == "nil":
                return Lit(None)
            # function call?
            if self.peek()[1] == "(":
                self.next()
                args = []
                if self.peek()[1] != ")":
                    args.append(self.parse_expr())
                    while self.peek()[1] == ",":
                        self.next()
                        args.append(self.parse_expr())
                self.expect(")")
                return Call(val, args)
            # path: ident(.ident | ["key"])*
            parts = [val]
            while True:
                if self.peek()[1] == ".":
                    self.next()
                    parts.append(self.next()[1])
                elif self.peek()[1] == "[":
                    self.next()
                    k = self.next()
                    if k[0] != "string":
                        raise ValueError("only string map keys supported")
                    parts.append(k[1][1:-1])
                    self.expect("]")
                else:
                    break
            return Path(parts)
        raise ValueError(f"unexpected token {val!r}")


def _parse(stmt: str) -> Statement:
    # split on a top-level ` where ` (the grammar allows only one)
    tokens = _tokenize(stmt)
    p = _Parser(tokens)
    editor = p.parse_expr()
    if not isinstance(editor, Call):
        raise ValueError(f"statement must start with an editor call: {stmt!r}")
    where = None
    if p.peek()[1] == "where":
        p.next()
        where = p.parse_expr()
    if p.peek()[0] != "eof":
        raise ValueError(f"trailing tokens in {stmt!r}")
    return Statement(editor, where, stmt)


# ---------------------------------------------------------------------------
# converter registry (pure functions; pkg/ottl/ottlfuncs/functions.go:36-120)
# ---------------------------------------------------------------------------

def _extract_patterns(col: Column, pattern: str) -> Column:
    """ExtractPatterns (func_extract_patterns.go:35-75): named groups ->
    map; empty map when no match. Accepts Python/grok `(?P<name>)` group
    syntax and translates to Java's `(?<name>)` for the JVM regex."""
    compiled = re.compile(pattern)
    groups = sorted(compiled.groupindex.items(), key=lambda kv: kv[1])
    if not groups:
        raise ValueError("ExtractPatterns requires named capture groups")
    jpattern = pattern.replace("(?P<", "(?<")
    entries = []
    for name, idx in groups:
        entries.append(F.lit(name))
        entries.append(F.regexp_extract(col, jpattern, idx))
    m = F.create_map(*entries)
    empty = F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<string>")
    )
    return F.when(col.rlike(jpattern), m).otherwise(empty)


CONVERTERS: dict[str, callable] = {
    # string — Concat(values[], delimiter) per ottlfuncs/func_concat.go
    "Concat": lambda vals, sep: F.concat_ws(sep._lit, *vals),
    "Split": lambda x, sep: F.split(x, re.escape(sep._lit)),
    "Trim": lambda x: F.trim(x),
    "ToUpperCase": lambda x: F.upper(x),
    "ToLowerCase": lambda x: F.lower(x),
    "ToSnakeCase": lambda x: F.lower(
        F.regexp_replace(
            F.regexp_replace(x, r"([a-z0-9])([A-Z])", r"$1_$2"), r"[\s-]+", "_"
        )
    ),
    "ToCamelCase": lambda x: F.concat_ws(
        "",
        F.transform(
            F.split(x, "[_ -]+"),
            lambda w: F.concat(
                F.upper(w.substr(F.lit(1), F.lit(1))),
                w.substr(F.lit(2), F.length(w)),
            ),
        ),
    ),
    "Len": lambda x: F.length(x),
    "Format": lambda fmt, vals: F.format_string(fmt._lit, *vals),
    "Base64Decode": lambda x: F.unbase64(x).cast("string"),
    "Decode": lambda x, enc: F.unbase64(x).cast("string"),
    "Hex": lambda x: F.hex(x),
    # collection
    "Sort": lambda x: F.array_sort(x),
    "IsMatch": lambda x, pat: x.rlike(pat._lit),
    "ExtractPatterns": lambda x, pat: _extract_patterns(x, pat._lit),
    # math / type
    "Int": lambda x: x.cast("long"),
    "Double": lambda x: x.cast("double"),
    "String": lambda x: x.cast("string"),
    "Log": lambda x: F.log(x),
    # time
    "Time": lambda x, fmt: F.to_timestamp(x, fmt._lit),
    "TruncateTime": lambda x, unit: F.date_trunc(unit._lit, x),
    "UnixSeconds": lambda x: F.unix_timestamp(x).cast("long"),
    "UnixMillis": lambda x: (F.unix_timestamp(x) * 1000).cast("long"),
    "UnixMicros": lambda x: F.unix_micros(x),
    "UnixNano": lambda x: F.unix_micros(x) * 1000,
    "Hour": lambda x: F.hour(x),
    "Minute": lambda x: F.minute(x),
    "Second": lambda x: F.second(x),
    "Day": lambda x: F.dayofmonth(x),
    "Month": lambda x: F.month(x),
    "Year": lambda x: F.year(x),
    # parse (converter forms; full parser stages live in operators/parsers.py)
    "ParseJSON": lambda x: F.from_json(x, "map<string,string>"),
    "ParseKeyValue": lambda x, pd=None, kd=None: F.str_to_map(
        x,
        F.lit(pd._lit if pd is not None else " "),
        F.lit(kd._lit if kd is not None else "="),
    ),
    # URL decomposition (ottlfuncs URL converter) — map of parts
    "URL": lambda x: F.create_map(
        F.lit("url.scheme"), F.parse_url(x, F.lit("PROTOCOL")),
        F.lit("url.domain"), F.parse_url(x, F.lit("HOST")),
        F.lit("url.path"), F.parse_url(x, F.lit("PATH")),
        F.lit("url.query"), F.parse_url(x, F.lit("QUERY")),
    ),
    # UserAgent converter — regex heuristic standing in for the
    # reference's ua-parser dependency (documented approximation)
    "UserAgent": lambda x: F.create_map(
        F.lit("user_agent.name"),
        F.coalesce(F.regexp_extract(x, r"(Firefox|Chrome|Safari|curl|wget)", 1),
                   F.lit("Other")),
        F.lit("user_agent.version"),
        F.regexp_extract(x, r"(?:Firefox|Chrome|curl|wget)[/ ]([\d.]+)", 1),
        F.lit("os.name"),
        F.coalesce(
            F.regexp_extract(x, r"(Windows|Mac OS X|Android|iPhone OS|Linux)", 1),
            F.lit("Other"),
        ),
    ),
    # hash / id
    "MD5": lambda x: F.md5(x.cast("string")),
    "SHA1": lambda x: F.sha1(x.cast("string")),
    "SHA256": lambda x: F.sha2(x.cast("string"), 256),
    "Murmur3Hash": lambda x: F.hash(x).cast("string"),  # 32-bit murmur3 (Spark-native)
    "UUID": lambda: F.expr("uuid()"),
}


_TYPE_PREDICATES = {
    "IsString": lambda dt: dt == "string",
    "IsBool": lambda dt: dt == "boolean",
    "IsInt": lambda dt: dt in ("int", "bigint", "smallint", "tinyint"),
    "IsDouble": lambda dt: dt in ("double", "float"),
    "IsMap": lambda dt: dt.startswith("map"),
    "IsList": lambda dt: dt.startswith("array"),
}


class _Ctx:
    """Compilation context: carries the current DataFrame (paths resolve
    against it) and the sequence's error mode."""

    def __init__(self, df: DataFrame, error_mode: str):
        self.df = df
        self.error_mode = error_mode


def _compile(node, ctx: _Ctx) -> Column:
    if isinstance(node, Lit):
        c = F.lit(node.value)
        c._lit = node.value  # converters that need the raw literal (regex, fmt)
        return c
    if isinstance(node, Path):
        name = node.column_name()
        return F.col(name)
    if isinstance(node, ListExpr):
        return [_compile(i, ctx) for i in node.items]
    if isinstance(node, BinOp):
        l, r = _compile(node.left, ctx), _compile(node.right, ctx)
        ops = {
            "==": lambda a, b: a == b,
            "!=": lambda a, b: a != b,
            ">": lambda a, b: a > b,
            "<": lambda a, b: a < b,
            ">=": lambda a, b: a >= b,
            "<=": lambda a, b: a <= b,
            "+": lambda a, b: a + b,
            "-": lambda a, b: a - b,
            "*": lambda a, b: a * b,
            "/": lambda a, b: a / b,
            "and": lambda a, b: a & b,
            "or": lambda a, b: a | b,
        }
        return ops[node.op](l, r)
    if isinstance(node, Call):
        if node.name == "not":
            return ~_compile(node.args[0], ctx)
        if node.name == "Substring":
            x = _compile(node.args[0], ctx)
            start = node.args[1].value if isinstance(node.args[1], Lit) else None
            ln = node.args[2].value if isinstance(node.args[2], Lit) else None
            return F.substring(x, start + 1, ln)  # OTTL is 0-based; SQL 1-based
        if node.name in ("Int", "Double") and ctx.error_mode in ("ignore", "silent"):
            # error_mode ignore: a bad value nulls out instead of failing
            # the statement (ottl config.go:14-16)
            return _compile(node.args[0], ctx).try_cast(
                "long" if node.name == "Int" else "double"
            )
        if node.name in _TYPE_PREDICATES:
            # OTTL type predicates check the VALUE type per record; in a
            # typed columnar model a column's type is static, so these
            # resolve to a literal at compile time (null-ness still
            # matters: a null value is not of any type)
            arg = node.args[0]
            if not isinstance(arg, Path):
                raise ValueError(f"{node.name} requires a path argument")
            name = arg.column_name()
            dtype = dict(ctx.df.dtypes).get(name, "")
            matches = _TYPE_PREDICATES[node.name](dtype)
            col = _compile(arg, ctx)
            return F.when(col.isNull(), F.lit(False)).otherwise(F.lit(matches))
        fn = CONVERTERS.get(node.name)
        if fn is None:
            raise ValueError(f"unknown converter {node.name!r}")
        return fn(*[_compile(a, ctx) for a in node.args])
    raise TypeError(type(node))


# ---------------------------------------------------------------------------
# editors (mutate the DataFrame; ottlfuncs/functions.go:12-26)
# ---------------------------------------------------------------------------

def _apply_editor(df: DataFrame, st: Statement, ctx: _Ctx) -> DataFrame:
    ed = st.editor
    cond = _compile(st.where, ctx) if st.where is not None else None

    def gated(col_name: str, new: Column) -> DataFrame:
        if cond is None:
            return df.withColumn(col_name, new)
        old = F.col(col_name) if col_name in df.columns else F.lit(None)
        return df.withColumn(col_name, F.when(cond, new).otherwise(old))

    if ed.name == "set":
        # set(target, value): nil value is a no-op (func_set.go:36-44)
        target, value = ed.args
        if isinstance(value, Lit) and value.value is None:
            return df
        if not isinstance(target, Path):
            raise ValueError("set target must be a path")
        return gated(target.column_name(), _compile(value, ctx))
    if ed.name == "delete_key":
        target, key = ed.args
        name = target.column_name()
        if dict(df.dtypes).get(name, "").startswith("map"):
            new = F.map_filter(F.col(name), lambda k, _: k != F.lit(key.value))
            return gated(name, new)
        # flat model: deleting a promoted column
        return df.drop(key.value)
    if ed.name == "keep_keys":
        target, keys = ed.args
        name = target.column_name()
        keep = [k.value for k in keys.items]
        if dict(df.dtypes).get(name, "").startswith("map"):
            arr = F.array(*[F.lit(k) for k in keep])
            return gated(name, F.map_filter(F.col(name), lambda k, _: F.array_contains(arr, k)))
        raise ValueError("keep_keys requires a map column")
    if ed.name in ("replace_pattern", "replace_all_patterns"):
        target, pattern, repl = ed.args[:3]
        name = target.column_name()
        return gated(name, F.regexp_replace(F.col(name), pattern.value, repl.value))
    if ed.name in ("replace_match", "replace_all_matches"):
        # glob match -> whole-value replacement (func_replace_match.go)
        target, glob_pat, repl = ed.args[:3]
        name = target.column_name()
        like = glob_pat.value.replace("%", r"\%").replace("*", "%").replace("?", "_")
        new = F.when(F.col(name).like(like), F.lit(repl.value)).otherwise(F.col(name))
        return gated(name, new)
    if ed.name == "merge_maps":
        # merge_maps(target, source, mode) (func_merge_maps.go:16-47)
        target, source, mode = ed.args
        name = target.column_name()
        t, s = F.col(name), _compile(source, ctx)
        m = mode.value
        if m == "upsert":
            new = F.map_concat(
                F.map_filter(t, lambda k, _: ~F.array_contains(F.map_keys(s), k)), s
            )
        elif m == "insert":
            new = F.map_concat(
                t, F.map_filter(s, lambda k, _: ~F.array_contains(F.map_keys(t), k))
            )
        elif m == "update":
            new = F.map_concat(
                F.map_filter(t, lambda k, _: ~F.array_contains(F.map_keys(s), k)),
                F.map_filter(s, lambda k, _: F.array_contains(F.map_keys(t), k)),
            )
        else:
            raise ValueError(f"merge_maps mode {m!r}")
        return gated(name, new)
    if ed.name == "truncate_all":
        target, n = ed.args
        name = target.column_name()
        return gated(
            name,
            F.transform_values(F.col(name), lambda _, v: F.substring(v, 1, n.value)),
        )
    if ed.name == "limit":
        target, n = ed.args[:2]
        name = target.column_name()
        return gated(
            name,
            F.map_from_entries(F.slice(F.map_entries(F.col(name)), 1, n.value)),
        )
    if ed.name == "append":
        target, value = ed.args
        name = target.column_name()
        return gated(name, F.concat(F.col(name), F.array(_compile(value, ctx))))
    raise ValueError(f"unknown editor {ed.name!r}")


_EDITORS = {
    "set", "delete_key", "keep_keys", "replace_pattern",
    "replace_all_patterns", "replace_match", "replace_all_matches",
    "merge_maps", "truncate_all", "limit", "append",
}


def _validate(node, *, top: bool = False) -> None:
    """Build-time function resolution (parser.go newFunctionCall analog):
    unknown editors/converters fail at compile, not mid-job."""
    if isinstance(node, Call):
        known = _EDITORS if top else (
            set(CONVERTERS)
            | set(_TYPE_PREDICATES)
            | {"not", "Substring", "Int", "Double"}
        )
        if node.name not in known:
            kind = "editor" if top else "converter"
            raise ValueError(f"unknown {kind} {node.name!r}")
        for a in node.args:
            _validate(a)
    elif isinstance(node, BinOp):
        _validate(node.left)
        _validate(node.right)
    elif isinstance(node, ListExpr):
        for i in node.items:
            _validate(i)


def compile_statement(stmt: str) -> Statement:
    """Parse one statement (driver-side, once — parser.go:241-253 analog)."""
    st = _parse(stmt)
    _validate(st.editor, top=True)
    if st.where is not None:
        _validate(st.where)
    return st


def apply_statements(
    df: DataFrame, statements: list[str], *, error_mode: str = "propagate"
) -> DataFrame:
    """StatementSequence.Execute (parser.go:356-371): statements apply in
    order; each sees the previous one's output."""
    ctx = _Ctx(df, error_mode)
    for s in statements:
        st = compile_statement(s)
        ctx.df = df = _apply_editor(df, st, ctx)
    return df
