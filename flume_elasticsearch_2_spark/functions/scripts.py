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

Grammar (recursive descent, no eval, no names outside the allowlist; the
full typed grammar incl. the round-4 MVEL widening — ternary conditionals,
``%``, ``Math.`` static spellings — is documented on :class:`_Parser`)::

    expr    := term (('+'|'-') term)*
    term    := unary (('*'|'/'|'%') unary)*
    unary   := '-' unary | primary
    primary := NUMBER | '(' expr ')' | FUNC '(' expr (',' expr)* ')'
             | '_score' | doc['FIELD'].value
    FUNC    := log | log1p | sqrt | abs | exp | floor | ceil
             | min | max | pow        (each also as Math.<name>)

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

_FUNCS_1 = {"log", "log1p", "sqrt", "abs", "exp", "floor", "ceil"}
_FUNCS_2 = {"min", "max", "pow"}
_FUNCS = _FUNCS_1 | _FUNCS_2

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)"
    r"|(?P<doc>doc\[\s*'(?P<field>[A-Za-z_][A-Za-z0-9_]*)'\s*\]\s*\.\s*value)"
    # MVEL scripts spell the functions as java.lang.Math statics
    # (Math.log(...)); the alias lexes to the same name token
    r"|Math\s*\.\s*(?P<mathfn>[A-Za-z_][A-Za-z0-9_]*)"
    r"|(?P<name>[A-Za-z_][A-Za-z0-9_]*)"
    # multi-char comparison/boolean operators before their single-char
    # prefixes, or `>=` lexes as `>` `=` and fails
    r"|(?P<op>>=|<=|==|!=|&&|\|\||[-+*/%(),><!?:]))"
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
        elif m.group("mathfn") is not None:
            fn = m.group("mathfn")
            if fn not in _FUNCS:
                raise ValueError(
                    f"script: Math.{fn} is not supported (functions: "
                    f"{sorted(_FUNCS)})"
                )
            toks.append(("name", fn))
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

    def numpy_vals(self, env: dict, score=None):
        """Evaluate over per-doc NumPy field arrays (round 5, the serving
        twin): ``env`` maps each referenced doc field to a double ndarray;
        returns an ndarray (or scalar for field-free scripts)."""
        if self.uses_score and score is None:
            raise ValueError("script references _score but no score array bound")
        return _to_numpy(self.ast, env, score)

    def sql(self, score_expr: str | None = None, qualifier: str = "") -> str:
        """Compile to the ANSI-SQL twin. ``score_expr`` substitutes ``_score``;
        ``qualifier`` (e.g. ``"d."``) prefixes doc-field references."""
        if self.uses_score and score_expr is None:
            raise ValueError("script references _score but no score expression bound")
        return _to_sql(self.ast, score_expr, qualifier)


_CMP_OPS = (">", "<", ">=", "<=", "==", "!=")


class _Parser:
    """One TYPED grammar for both script contexts (round 4 unification —
    previously an arithmetic parser plus a boolean subclass with
    backtracking; the typed grammar subsumes both and adds the MVEL
    constructs real 1.x scripts use: ternary conditionals, ``%``, and the
    ``Math.`` spellings)::

        full    := ternary
        ternary := bor ('?' ternary ':' ternary)?      # cond must be bool,
                                                       # branches num
        bor     := band ('||' band)*                   # bool operands
        band    := bnot ('&&' bnot)*
        bnot    := '!' bnot | rel
        rel     := expr (CMP expr)?        # bool if CMP present, else num
        expr    := term (('+'|'-') term)*
        term    := unary (('*'|'/'|'%') unary)*
        unary   := '-' unary | primary
        primary := NUMBER | '(' full ')' | FUNC '(' full (',' full)* ')'
                 | '_score' | doc['FIELD'].value

    Every production returns ``(ast, type)`` with type ``num`` | ``bool``;
    a type mismatch (``1 + (a > b)``, ``x ? .. : ..`` with numeric x,
    ``!5``) raises at parse time — the no-silent-best-effort contract.
    Operands stay NULL-free (doc fields coalesce to 0.0), so boolean
    parity with the SQL twin has no three-valued-logic surface."""

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

    @staticmethod
    def _want(node_type: tuple, want: str, ctx: str):
        node, typ = node_type
        if typ != want:
            raise ValueError(f"script: {ctx} requires a {want} operand, got {typ}")
        return node

    def full(self) -> tuple:
        return self.ternary()

    def ternary(self) -> tuple:
        node, typ = self.bor()
        if self.peek() == ("op", "?"):
            self.take()
            cond = node if typ == "bool" else None
            if cond is None:
                raise ValueError("script: '?:' condition must be boolean")
            a = self._want(self.ternary(), "num", "'?:' branch")
            self.expect_op(":")
            b = self._want(self.ternary(), "num", "'?:' branch")
            return ("ternary", cond, a, b), "num"
        return node, typ

    def bor(self) -> tuple:
        node, typ = self.band()
        while self.peek() == ("op", "||"):
            self.take()
            l = self._want((node, typ), "bool", "'||'")
            node, typ = ("or", l, self._want(self.band(), "bool", "'||'")), "bool"
        return node, typ

    def band(self) -> tuple:
        node, typ = self.bnot()
        while self.peek() == ("op", "&&"):
            self.take()
            l = self._want((node, typ), "bool", "'&&'")
            node, typ = ("and", l, self._want(self.bnot(), "bool", "'&&'")), "bool"
        return node, typ

    def bnot(self) -> tuple:
        if self.peek() == ("op", "!"):
            self.take()
            return ("not", self._want(self.bnot(), "bool", "'!'")), "bool"
        return self.rel()

    def rel(self) -> tuple:
        node, typ = self.expr()
        t = self.peek()
        if t is not None and t[0] == "op" and t[1] in _CMP_OPS:
            self.take()
            l = self._want((node, typ), "num", "comparison")
            r = self._want(self.expr(), "num", "comparison")
            return ("cmp", t[1], l, r), "bool"
        return node, typ

    def expr(self) -> tuple:
        node, typ = self.term()
        while self.peek() in (("op", "+"), ("op", "-")):
            op = self.take()[1]
            l = self._want((node, typ), "num", f"{op!r}")
            node, typ = ("bin", op, l, self._want(self.term(), "num", f"{op!r}")), "num"
        return node, typ

    def term(self) -> tuple:
        node, typ = self.unary()
        while self.peek() in (("op", "*"), ("op", "/"), ("op", "%")):
            op = self.take()[1]
            l = self._want((node, typ), "num", f"{op!r}")
            node, typ = ("bin", op, l, self._want(self.unary(), "num", f"{op!r}")), "num"
        return node, typ

    def unary(self) -> tuple:
        if self.peek() == ("op", "-"):
            self.take()
            return ("neg", self._want(self.unary(), "num", "unary '-'")), "num"
        return self.primary()

    def primary(self) -> tuple:
        kind, val = self.take()
        if kind == "num":
            return ("num", float(val)), "num"
        if kind == "field":
            self.fields.add(val)
            return ("field", val), "num"
        if kind == "op" and val == "(":
            node, typ = self.full()
            self.expect_op(")")
            return node, typ
        if kind == "name":
            if val == "_score":
                self.uses_score = True
                return ("score",), "num"
            if val in _FUNCS:
                self.expect_op("(")
                args = [self._want(self.full(), "num", f"{val}()")]
                while self.peek() == ("op", ","):
                    self.take()
                    args.append(self._want(self.full(), "num", f"{val}()"))
                self.expect_op(")")
                want = 1 if val in _FUNCS_1 else 2
                if len(args) != want:
                    raise ValueError(f"script: {val}() takes {want} arg(s), got {len(args)}")
                return ("call", val, args), "num"
            raise ValueError(
                f"script: unknown name {val!r} (fields are doc['f'].value; "
                f"functions: {sorted(_FUNCS)})"
            )
        raise ValueError(f"script: unexpected token {val!r}")


def parse_script(src: str) -> Script:
    """Parse a NUMERIC script (``script_score`` / ``script_fields`` /
    ``_script`` sort sources) into a :class:`Script`; raises ``ValueError``
    on anything outside the documented grammar or a boolean result."""
    p = _Parser(_lex(src))
    node, typ = p.full()
    if p.peek() is not None:
        raise ValueError(f"script: trailing input at {p.peek()[1]!r}")
    if typ != "num":
        raise ValueError("script: a scoring script must evaluate to a number")
    return Script(source=src, ast=node, fields=p.fields, uses_score=p.uses_score)


def parse_predicate(src: str) -> Script:
    """Parse a BOOLEAN script (the ES ``script`` filter's source) into a
    :class:`Script` whose ``spark_col()``/``sql()`` yield a boolean
    Column/predicate. ``_score`` is rejected — ES filter context is
    non-scoring and has no score in scope."""
    p = _Parser(_lex(src))
    node, typ = p.full()
    if p.peek() is not None:
        raise ValueError(f"script predicate: trailing input at {p.peek()[1]!r}")
    if typ != "bool":
        raise ValueError("script predicate: a filter script must evaluate to a boolean")
    if p.uses_score:
        raise ValueError("script predicate: _score is not in scope in filter context")
    return Script(source=src, ast=node, fields=p.fields, uses_score=False)


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
        # % is Java remainder (sign of dividend) in Spark AND DuckDB — parity
        return {"+": l + r, "-": l - r, "*": l * r, "/": l / r, "%": l % r}[op]
    if kind == "ternary":
        return F.when(
            _to_spark(node[1], score), _to_spark(node[2], score)
        ).otherwise(_to_spark(node[3], score))
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
        if fn == "exp":
            return F.exp(args[0])
        # Spark floor/ceil return LONG; cast to match DuckDB's double
        if fn == "floor":
            return F.floor(args[0]).cast("double")
        if fn == "ceil":
            return F.ceil(args[0]).cast("double")
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
    if kind == "ternary":
        c = _to_sql(node[1], score_expr, qual)
        a = _to_sql(node[2], score_expr, qual)
        b = _to_sql(node[3], score_expr, qual)
        return f"(CASE WHEN {c} THEN {a} ELSE {b} END)"
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
        if fn == "exp":
            return f"exp({args[0]})"
        if fn == "floor":
            return f"CAST(floor({args[0]}) AS DOUBLE)"
        if fn == "ceil":
            return f"CAST(ceil({args[0]}) AS DOUBLE)"
    raise AssertionError(f"unreachable AST node {node!r}")


def _to_numpy(node: tuple, env: dict, score):
    """Third engine for the script AST (round 5): vectorized NumPy
    evaluation over per-doc field arrays — the serving-path twin of
    :func:`_to_spark`, used by the per-shard metric-agg partials.  Parity
    pins mirrored from the other two compilers: doc fields coalesce
    NaN→0.0, ``%`` is Java remainder (``np.fmod``: sign of dividend),
    ``floor``/``ceil`` stay double, comparisons operate on never-NULL
    doubles."""
    import numpy as np

    k = node[0]
    if k == "num":
        return float(node[1])
    if k == "score":
        return score
    if k == "field":
        return np.nan_to_num(env[node[1]], nan=0.0)
    if k == "neg":
        return -_to_numpy(node[1], env, score)
    if k == "bin":
        op = node[1]
        l, r = _to_numpy(node[2], env, score), _to_numpy(node[3], env, score)
        if op == "%":
            return np.fmod(l, r)
        if op == "+":
            return l + r
        if op == "-":
            return l - r
        if op == "*":
            return l * r
        return l / r
    if k == "ternary":
        return np.where(
            _to_numpy(node[1], env, score),
            _to_numpy(node[2], env, score),
            _to_numpy(node[3], env, score),
        )
    if k == "cmp":
        op = node[1]
        l, r = _to_numpy(node[2], env, score), _to_numpy(node[3], env, score)
        return {
            ">": l > r, "<": l < r, ">=": l >= r, "<=": l <= r,
            "==": l == r, "!=": l != r,
        }[op]
    if k == "and":
        return np.logical_and(_to_numpy(node[1], env, score), _to_numpy(node[2], env, score))
    if k == "or":
        return np.logical_or(_to_numpy(node[1], env, score), _to_numpy(node[2], env, score))
    if k == "not":
        return np.logical_not(_to_numpy(node[1], env, score))
    if k == "call":
        fn = node[1]
        args = [_to_numpy(a, env, score) for a in node[2]]
        from functools import reduce as _reduce

        if fn == "log":
            return np.log(args[0])
        if fn == "log1p":
            return np.log1p(args[0])
        if fn == "sqrt":
            return np.sqrt(args[0])
        if fn == "abs":
            return np.abs(args[0])
        if fn == "min":
            return _reduce(np.minimum, args)
        if fn == "max":
            return _reduce(np.maximum, args)
        if fn == "pow":
            return np.power(args[0], args[1])
        if fn == "exp":
            return np.exp(args[0])
        if fn == "floor":
            return np.floor(args[0])
        if fn == "ceil":
            return np.ceil(args[0])
    raise AssertionError(f"unreachable AST node {node!r}")
