"""Safe arithmetic script compiler — ES 1.x ``script_score`` / ``script_fields``.

The reference delegates scripting to Elasticsearch 1.1's MVEL engine
(ElasticsearchSink.java:54 ships the raw search body to ES). Arbitrary MVEL is
an interpreter; at 10^12 docs a per-row interpreted script is the difference
between a JVM-codegen scan and a Python/MVEL crawl. So the engine supports the
*arithmetic expression subset* — the part of scripting that real scoring
scripts actually use (Lucene's own "expressions" module made the same cut for
the same reason) — and compiles each script ONCE, at parse time, into BOTH

* a Spark ``Column`` tree (pure JVM arithmetic, whole-stage codegen, no UDF), and
* an ANSI-SQL string with identical semantics (the DuckDB oracle twin),

so the two engines evaluate bit-for-bit the same float64 expression.

Grammar (recursive descent, no eval, no names outside the allowlist)::

    expr    := term (('+'|'-') term)*
    term    := unary (('*'|'/') unary)*
    unary   := '-' unary | primary
    primary := NUMBER | '(' expr ')' | FUNC '(' expr (',' expr)* ')'
             | '_score' | doc['FIELD'].value
    FUNC    := log | log1p | sqrt | abs | min | max | pow

``log`` is the NATURAL log (Lucene expressions' ``ln``/ES MVEL ``log`` — both
engines emit ln). ``doc['f'].value`` follows ES 1.x doc-values semantics:
a missing/NULL numeric field reads as 0.0 (ES fielddata default), compiled as
``coalesce(cast(f as double), 0.0)`` in both engines — NULL never propagates,
so Spark's nulls-last and DuckDB's nulls-first desc orderings can't diverge.

:func:`parse_predicate` adds the BOOLEAN layer the ES ``script`` FILTER
context needs (comparisons ``> < >= <= == !=`` over arithmetic operands,
combined with ``&&``/``||``/``!``); because doc fields coalesce NULL to 0.0
before any comparison, no predicate is ever NULL and Spark/DuckDB
three-valued-logic can't diverge. ``_score`` is rejected there (filter
context is non-scoring).

Unsupported constructs (assignments, conditionals, string ops, method calls,
``_source`` access) raise ``ValueError`` at parse time — the module-wide
no-silent-best-effort contract.
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["Script", "parse_predicate", "parse_script"]

_FUNCS_1 = {"log", "log1p", "sqrt", "abs"}
_FUNCS_2 = {"min", "max", "pow"}
_FUNCS = _FUNCS_1 | _FUNCS_2

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)"
    r"|(?P<doc>doc\[\s*'(?P<field>[A-Za-z_][A-Za-z0-9_]*)'\s*\]\s*\.\s*value)"
    r"|(?P<name>[A-Za-z_][A-Za-z0-9_]*)"
    # multi-char comparison/boolean operators before their single-char
    # prefixes, or `>=` lexes as `>` `=` and fails
    r"|(?P<op>>=|<=|==|!=|&&|\|\||[-+*/(),><!]))"
)


def _lex(src: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m or m.end() == pos:
            rest = src[pos:].strip()
            if not rest:
                break
            raise ValueError(f"script: cannot tokenize at {rest[:20]!r}")
        if m.group("num") is not None:
            toks.append(("num", m.group("num")))
        elif m.group("doc") is not None:
            toks.append(("field", m.group("field")))
        elif m.group("name") is not None:
            toks.append(("name", m.group("name")))
        else:
            toks.append(("op", m.group("op")))
        pos = m.end()
    return toks


@dataclass
class Script:
    """A parsed script: the AST plus the referenced doc fields / _score flag."""

    source: str
    ast: tuple
    fields: set[str] = dc_field(default_factory=set)
    uses_score: bool = False

    def spark_col(self, score: Column | None = None) -> Column:
        """Compile to a Spark Column. ``score`` binds ``_score``; doc fields
        resolve as columns of the enclosing plan (coalesce(double, 0))."""
        if self.uses_score and score is None:
            raise ValueError("script references _score but no score column bound")
        return _to_spark(self.ast, score)

    def sql(self, score_expr: str | None = None, qualifier: str = "") -> str:
        """Compile to the ANSI-SQL twin. ``score_expr`` substitutes ``_score``;
        ``qualifier`` (e.g. ``"d."``) prefixes doc-field references."""
        if self.uses_score and score_expr is None:
            raise ValueError("script references _score but no score expression bound")
        return _to_sql(self.ast, score_expr, qualifier)


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0
        self.fields: set[str] = set()
        self.uses_score = False

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self) -> tuple[str, str]:
        t = self.peek()
        if t is None:
            raise ValueError("script: unexpected end of expression")
        self.i += 1
        return t

    def expect_op(self, op: str) -> None:
        t = self.take()
        if t != ("op", op):
            raise ValueError(f"script: expected {op!r}, got {t[1]!r}")

    def expr(self) -> tuple:
        node = self.term()
        while self.peek() in (("op", "+"), ("op", "-")):
            op = self.take()[1]
            node = ("bin", op, node, self.term())
        return node

    def term(self) -> tuple:
        node = self.unary()
        while self.peek() in (("op", "*"), ("op", "/")):
            op = self.take()[1]
            node = ("bin", op, node, self.unary())
        return node

    def unary(self) -> tuple:
        if self.peek() == ("op", "-"):
            self.take()
            return ("neg", self.unary())
        return self.primary()

    def primary(self) -> tuple:
        kind, val = self.take()
        if kind == "num":
            return ("num", float(val))
        if kind == "field":
            self.fields.add(val)
            return ("field", val)
        if kind == "op" and val == "(":
            node = self.expr()
            self.expect_op(")")
            return node
        if kind == "name":
            if val == "_score":
                self.uses_score = True
                return ("score",)
            if val in _FUNCS:
                self.expect_op("(")
                args = [self.expr()]
                while self.peek() == ("op", ","):
                    self.take()
                    args.append(self.expr())
                self.expect_op(")")
                want = 1 if val in _FUNCS_1 else 2
                if len(args) != want:
                    raise ValueError(f"script: {val}() takes {want} arg(s), got {len(args)}")
                return ("call", val, args)
            raise ValueError(
                f"script: unknown name {val!r} (fields are doc['f'].value; "
                f"functions: {sorted(_FUNCS)})"
            )
        raise ValueError(f"script: unexpected token {val!r}")


_CMP_OPS = (">", "<", ">=", "<=", "==", "!=")


class _PredParser(_Parser):
    """Boolean-predicate layer over the arithmetic grammar — the ES 1.x
    ``script`` FILTER context (a script returning true/false)::

        bpred   := bterm ('||' bterm)*
        bterm   := bfactor ('&&' bfactor)*
        bfactor := '!' bfactor | cmp | '(' bpred ')'
        cmp     := expr ('>'|'<'|'>='|'<='|'=='|'!=') expr

    A leading ``(`` is ambiguous (arithmetic vs boolean group); the parser
    tries the comparison first and backtracks to the boolean group on
    failure, restoring the field/_score bookkeeping so a failed attempt
    leaves no trace. Operands are the arithmetic grammar's — doc fields
    coalesce NULL to 0.0, so no comparison ever evaluates to NULL and the
    Spark/DuckDB boolean parity is total (no three-valued-logic surface)."""

    def bpred(self) -> tuple:
        node = self.bterm()
        while self.peek() == ("op", "||"):
            self.take()
            node = ("or", node, self.bterm())
        return node

    def bterm(self) -> tuple:
        node = self.bfactor()
        while self.peek() == ("op", "&&"):
            self.take()
            node = ("and", node, self.bfactor())
        return node

    def bfactor(self) -> tuple:
        if self.peek() == ("op", "!"):
            self.take()
            return ("not", self.bfactor())
        if self.peek() == ("op", "("):
            state = (self.i, set(self.fields), self.uses_score)
            try:
                return self.cmp()
            except ValueError:
                self.i, self.fields, self.uses_score = state
            self.take()  # '('
            node = self.bpred()
            self.expect_op(")")
            return node
        return self.cmp()

    def cmp(self) -> tuple:
        l = self.expr()
        t = self.peek()
        if t is None or t[0] != "op" or t[1] not in _CMP_OPS:
            raise ValueError(
                f"script predicate: expected a comparison operator, got "
                f"{t[1]!r}" if t else "script predicate: expected a comparison"
            )
        self.take()
        return ("cmp", t[1], l, self.expr())


def parse_script(src: str) -> Script:
    """Parse ``src`` into a :class:`Script`; raises ``ValueError`` on anything
    outside the documented grammar."""
    p = _Parser(_lex(src))
    ast = p.expr()
    if p.peek() is not None:
        raise ValueError(f"script: trailing input at {p.peek()[1]!r}")
    return Script(source=src, ast=ast, fields=p.fields, uses_score=p.uses_score)


def parse_predicate(src: str) -> Script:
    """Parse a BOOLEAN script (the ES ``script`` filter's source) into a
    :class:`Script` whose ``spark_col()``/``sql()`` yield a boolean
    Column/predicate. ``_score`` is rejected — ES filter context is
    non-scoring and has no score in scope."""
    p = _PredParser(_lex(src))
    ast = p.bpred()
    if p.peek() is not None:
        raise ValueError(f"script predicate: trailing input at {p.peek()[1]!r}")
    if p.uses_score:
        raise ValueError("script predicate: _score is not in scope in filter context")
    return Script(source=src, ast=ast, fields=p.fields, uses_score=False)


def _to_spark(node: tuple, score: Column | None) -> Column:
    kind = node[0]
    if kind == "num":
        return F.lit(float(node[1]))
    if kind == "score":
        return score  # type: ignore[return-value]
    if kind == "field":
        # ES 1.x doc-values: missing numeric reads as 0.0
        return F.coalesce(F.col(node[1]).cast("double"), F.lit(0.0))
    if kind == "neg":
        return -_to_spark(node[1], score)
    if kind == "bin":
        op, l, r = node[1], _to_spark(node[2], score), _to_spark(node[3], score)
        return {"+": l + r, "-": l - r, "*": l * r, "/": l / r}[op]
    if kind == "cmp":
        op, l, r = node[1], _to_spark(node[2], score), _to_spark(node[3], score)
        # operands are coalesced doubles/literals — never NULL, so != is safe
        return {
            ">": l > r, "<": l < r, ">=": l >= r, "<=": l <= r,
            "==": l == r, "!=": l != r,
        }[op]
    if kind == "and":
        return _to_spark(node[1], score) & _to_spark(node[2], score)
    if kind == "or":
        return _to_spark(node[1], score) | _to_spark(node[2], score)
    if kind == "not":
        return ~_to_spark(node[1], score)
    if kind == "call":
        fn, args = node[1], [_to_spark(a, score) for a in node[2]]
        if fn == "log":
            return F.log(args[0])
        if fn == "log1p":
            return F.log1p(args[0])
        if fn == "sqrt":
            return F.sqrt(args[0])
        if fn == "abs":
            return F.abs(args[0])
        if fn == "min":
            return F.least(*args)
        if fn == "max":
            return F.greatest(*args)
        if fn == "pow":
            return F.pow(*args)
    raise AssertionError(f"unreachable AST node {node!r}")


def _to_sql(node: tuple, score_expr: str | None, qual: str) -> str:
    kind = node[0]
    if kind == "num":
        return repr(float(node[1]))
    if kind == "score":
        return f"({score_expr})"
    if kind == "field":
        return f"coalesce(CAST({qual}{node[1]} AS DOUBLE), 0.0)"
    if kind == "neg":
        return f"(- {_to_sql(node[1], score_expr, qual)})"
    if kind == "bin":
        l = _to_sql(node[2], score_expr, qual)
        r = _to_sql(node[3], score_expr, qual)
        return f"({l} {node[1]} {r})"
    if kind == "cmp":
        l = _to_sql(node[2], score_expr, qual)
        r = _to_sql(node[3], score_expr, qual)
        # operands never NULL (coalesce), so <> matches Spark's != exactly
        op = {"==": "=", "!=": "<>"}.get(node[1], node[1])
        return f"({l} {op} {r})"
    if kind == "and":
        return f"({_to_sql(node[1], score_expr, qual)} AND {_to_sql(node[2], score_expr, qual)})"
    if kind == "or":
        return f"({_to_sql(node[1], score_expr, qual)} OR {_to_sql(node[2], score_expr, qual)})"
    if kind == "not":
        return f"(NOT {_to_sql(node[1], score_expr, qual)})"
    if kind == "call":
        fn, args = node[1], [_to_sql(a, score_expr, qual) for a in node[2]]
        if fn == "log":
            return f"ln({args[0]})"
        if fn == "log1p":
            return f"ln(1.0 + ({args[0]}))"
        if fn == "sqrt":
            return f"sqrt({args[0]})"
        if fn == "abs":
            return f"abs({args[0]})"
        if fn == "min":
            return f"least({args[0]}, {args[1]})"
        if fn == "max":
            return f"greatest({args[0]}, {args[1]})"
        if fn == "pow":
            return f"power({args[0]}, {args[1]})"
    raise AssertionError(f"unreachable AST node {node!r}")
