"""Filter expression language — the reference's subgraph-filter AST.

Parses the expression surface of
subgraph-filtering/src/main/java/org/neo4j/gds/beta/filter/expression/
ExpressionParser.java (Javacc grammar ``Expression.jj``) into a small
AST and evaluates it VECTORIZED over numpy property arrays:

- variables ``n`` (node) and ``r`` (relationship);
- property access ``n.prop`` / ``r.prop``;
- label / type checks ``n:Label`` and ``r:TYPE``;
- comparisons ``> >= < <= = <>``;
- boolean ``AND`` / ``OR`` / ``NOT`` (case-insensitive), parentheses;
- literals: numbers, single/double-quoted strings, ``true``/``false``.

``evaluate`` takes a context of property arrays (one value per entity
row) and returns a boolean keep-mask — one vectorized numpy expression
per AST node, no per-row Python. The degree function and arithmetic are
intentionally out of scope (the reference's grammar core is
comparisons + boolean operators + label predicates).
"""

from __future__ import annotations

import re

import numpy as np

_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<num>-?\d+(?:\.\d+)?)"
    r"|(?P<str>'[^']*'|\"[^\"]*\")"
    r"|(?P<op><>|>=|<=|=|>|<)"
    r"|(?P<lpar>\()"
    r"|(?P<rpar>\))"
    r"|(?P<colon>:)"
    r"|(?P<dot>\.)"
    r"|(?P<ident>[A-Za-z_][A-Za-z0-9_]*)"
    r")"
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None or m.end() == pos:
            rest = text[pos:].strip()
            if not rest:
                break
            raise ValueError(f"cannot tokenize filter expression at: {rest!r}")
        pos = m.end()
        for kind in ("num", "str", "op", "lpar", "rpar", "colon", "dot",
                     "ident"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    return out


class Expr:
    def evaluate(self, ctx: dict):
        raise NotImplementedError


class Literal(Expr):
    def __init__(self, value):
        self.value = value

    def evaluate(self, ctx):
        return self.value


class Property(Expr):
    """``n.prop`` — resolved from ctx[var]["props"][prop]."""

    def __init__(self, var: str, prop: str):
        self.var, self.prop = var, prop

    def evaluate(self, ctx):
        ent = ctx.get(self.var)
        if ent is None:
            raise KeyError(f"unknown variable {self.var!r} in filter")
        props = ent.get("props", {})
        if self.prop not in props:
            raise KeyError(
                f"unknown property {self.var}.{self.prop} "
                f"(have: {sorted(props)})"
            )
        return np.asarray(props[self.prop])


class HasLabel(Expr):
    """``n:Label`` — resolved from ctx[var]["labels"][label] (bool)."""

    def __init__(self, var: str, label: str):
        self.var, self.label = var, label

    def evaluate(self, ctx):
        ent = ctx.get(self.var)
        if ent is None:
            raise KeyError(f"unknown variable {self.var!r} in filter")
        labels = ent.get("labels", {})
        if self.label in labels:
            return np.asarray(labels[self.label], dtype=bool)
        n = ctx.get("_n_rows")
        return np.zeros(int(n or 0), dtype=bool)


class Compare(Expr):
    _OPS = {
        ">": np.greater, ">=": np.greater_equal,
        "<": np.less, "<=": np.less_equal,
        "=": lambda a, b: np.asarray(a) == np.asarray(b),
        "<>": lambda a, b: np.asarray(a) != np.asarray(b),
    }

    def __init__(self, op: str, left: Expr, right: Expr):
        self.op, self.left, self.right = op, left, right

    def evaluate(self, ctx):
        return self._OPS[self.op](self.left.evaluate(ctx),
                                  self.right.evaluate(ctx))


class BoolOp(Expr):
    def __init__(self, op: str, parts: list[Expr]):
        self.op, self.parts = op, parts

    def evaluate(self, ctx):
        vals = [np.asarray(p.evaluate(ctx), dtype=bool) for p in self.parts]
        out = vals[0]
        for v in vals[1:]:
            out = (out & v) if self.op == "and" else (out | v)
        return out


class Not(Expr):
    def __init__(self, inner: Expr):
        self.inner = inner

    def evaluate(self, ctx):
        return ~np.asarray(self.inner.evaluate(ctx), dtype=bool)


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind):
        k, v = self.next()
        if k != kind:
            raise ValueError(f"expected {kind}, got {v!r}")
        return v

    # grammar: or_expr := and_expr (OR and_expr)*
    def parse(self) -> Expr:
        e = self.or_expr()
        if self.i != len(self.toks):
            raise ValueError(
                f"trailing tokens in filter: {self.toks[self.i:]}"
            )
        return e

    def or_expr(self) -> Expr:
        parts = [self.and_expr()]
        while self._kw("or"):
            parts.append(self.and_expr())
        return parts[0] if len(parts) == 1 else BoolOp("or", parts)

    def and_expr(self) -> Expr:
        parts = [self.not_expr()]
        while self._kw("and"):
            parts.append(self.not_expr())
        return parts[0] if len(parts) == 1 else BoolOp("and", parts)

    def not_expr(self) -> Expr:
        if self._kw("not"):
            return Not(self.not_expr())
        return self.cmp()

    def cmp(self) -> Expr:
        left = self.term()
        k, v = self.peek()
        if k == "op":
            self.next()
            return Compare(v, left, self.term())
        return left

    def term(self) -> Expr:
        k, v = self.peek()
        if k == "num":
            self.next()
            return Literal(float(v) if "." in v else int(v))
        if k == "str":
            self.next()
            return Literal(v[1:-1])
        if k == "lpar":
            self.next()
            e = self.or_expr()
            self.expect("rpar")
            return e
        if k == "ident":
            self.next()
            low = v.lower()
            if low == "true":
                return Literal(True)
            if low == "false":
                return Literal(False)
            nk, _nv = self.peek()
            if nk == "dot":
                self.next()
                prop = self.expect("ident")
                return Property(v, prop)
            if nk == "colon":
                self.next()
                label = self.expect("ident")
                return HasLabel(v, label)
            raise ValueError(
                f"bare identifier {v!r}: use {v}.prop or {v}:Label"
            )
        raise ValueError(f"unexpected token {v!r}")

    def _kw(self, word: str) -> bool:
        k, v = self.peek()
        if k == "ident" and v.lower() == word:
            self.next()
            return True
        return False


def parse_expression(text: str) -> Expr:
    """Parse a filter expression string into an AST."""
    return _Parser(_tokenize(text)).parse()


def labels_in(ast: Expr) -> set[str]:
    """All label/type names an AST checks (for lazy label-array binding)."""
    out: set[str] = set()
    if isinstance(ast, HasLabel):
        out.add(ast.label)
    for child in ("left", "right", "inner"):
        if hasattr(ast, child):
            out |= labels_in(getattr(ast, child))
    if hasattr(ast, "parts"):
        for p in ast.parts:
            out |= labels_in(p)
    return out


def evaluate_node_filter(
    text: str, props: dict, labels: dict | None = None, n_rows: int | None = None
) -> np.ndarray:
    """Boolean keep-mask for nodes: ``props`` maps property name →
    per-node array (bind what the expression needs, e.g.
    ``{"key": idmap.keys, "score": score_array}``)."""
    ast = parse_expression(text)
    sizes = [len(np.asarray(v)) for v in props.values()]
    n = n_rows if n_rows is not None else (sizes[0] if sizes else 0)
    ctx = {"n": {"props": props, "labels": labels or {}}, "_n_rows": n}
    out = np.asarray(ast.evaluate(ctx), dtype=bool)
    if out.shape == ():
        out = np.full(n, bool(out))
    return out


def evaluate_edge_filter(
    text: str, props: dict, types: dict | None = None, n_rows: int | None = None
) -> np.ndarray:
    """Boolean keep-mask for edges: ``props`` maps property name →
    per-edge array (``src``, ``dst``, ``weight``, …); ``types`` maps
    relationship type name → bool array for ``r:TYPE`` checks."""
    ast = parse_expression(text)
    sizes = [len(np.asarray(v)) for v in props.values()]
    n = n_rows if n_rows is not None else (sizes[0] if sizes else 0)
    ctx = {"r": {"props": props, "labels": types or {}}, "_n_rows": n}
    out = np.asarray(ast.evaluate(ctx), dtype=bool)
    if out.shape == ():
        out = np.full(n, bool(out))
    return out
