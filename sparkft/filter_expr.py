"""Meilisearch filter-expression language over the attribute store.

Meilisearch `filter` accepts an expression string — `genre = horror AND
price > 20`, `genre IN [horror, comedy]`, `NOT genre = horror`, parentheses
(https://www.meilisearch.com/docs/learn/filtering_and_sorting). This module
implements the core subset as a recursive-descent parser plus a set-algebra
evaluator that resolves to a SORTED int64 doc-id array:

    expr   := or
    or     := and ("OR" and)*
    and    := unary ("AND" unary)*
    unary  := "NOT" unary | "(" expr ")" | cmp
    cmp    := ident ("=" | "!=" | ">" | ">=" | "<" | "<=") value
            | ident "IN" "[" value ("," value)* "]"
            | ident value "TO" value          (inclusive range, Meilisearch)
    value  := number | 'quoted' | "quoted" | bareword

Evaluation cost model (the 100 TB story):
- `=` / `IN` resolve through the per-facet-value AttributeIndex when the
  build wrote one for the column — ONE bucket of ONE attr partition per
  value, O(matching ids), corpus-size independent;
- range / `!=` comparisons gather the column once from the bucketed
  AttributeStore (vectorized numpy mask over the store's doc-id-sorted
  runs) — O(corpus/bucket) per touched bucket, the analogue of a
  columnar predicate scan; a sorted numeric variant of the attribute
  index would prune this to O(matching), noted not built;
- AND/OR/NOT are sorted-array intersect/union/difference (np.intersect1d
  on already-sorted inputs).

Strings compare by equality only (like Meilisearch, which orders only
numbers); comparing a number-typed column against a non-number raises.
"""

from __future__ import annotations

import re
from typing import Optional, Union

import numpy as np

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<lbrack>\[) | (?P<rbrack>\]) | (?P<comma>,) |
        (?P<op>!=|>=|<=|=|>|<) |
        (?P<squote>'(?:[^'\\]|\\.)*') |
        (?P<dquote>"(?:[^"\\]|\\.)*") |
        (?P<word>[^\s()\[\],!=<>]+)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"AND", "OR", "NOT", "IN", "TO"}


class FilterSyntaxError(ValueError):
    pass


def _tokenize(s: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip():
                raise FilterSyntaxError(
                    f"unparsable filter at {s[pos:pos + 20]!r}")
            break
        pos = m.end()
        kind = m.lastgroup
        text = m.group(m.lastgroup)
        if kind in ("squote", "dquote"):
            body = text[1:-1]
            out.append(("value", re.sub(r"\\(.)", r"\1", body)))
        elif kind == "word":
            up = text.upper()
            if up in _KEYWORDS:
                out.append((up, text))
            else:
                out.append(("word", text))
        else:
            out.append((kind, text))
    return out


# ---- AST ----------------------------------------------------------------

class _Cmp:
    __slots__ = ("col", "op", "value")

    def __init__(self, col, op, value):
        self.col, self.op, self.value = col, op, value


class _In:
    __slots__ = ("col", "values")

    def __init__(self, col, values):
        self.col, self.values = col, values


class _Range:
    __slots__ = ("col", "lo", "hi")

    def __init__(self, col, lo, hi):
        self.col, self.lo, self.hi = col, lo, hi


class _Not:
    __slots__ = ("child",)

    def __init__(self, child):
        self.child = child


class _Bool:
    __slots__ = ("op", "children")

    def __init__(self, op, children):
        self.op, self.children = op, children


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _take(self, kind=None):
        k, v = self._peek()
        if kind is not None and k != kind:
            raise FilterSyntaxError(f"expected {kind}, got {v!r}")
        self.i += 1
        return k, v

    def parse(self):
        node = self._or()
        if self.i != len(self.toks):
            raise FilterSyntaxError(
                f"trailing tokens from {self._peek()[1]!r}")
        return node

    def _or(self):
        children = [self._and()]
        while self._peek()[0] == "OR":
            self._take()
            children.append(self._and())
        return children[0] if len(children) == 1 else _Bool("or", children)

    def _and(self):
        children = [self._unary()]
        while self._peek()[0] == "AND":
            self._take()
            children.append(self._unary())
        return children[0] if len(children) == 1 else _Bool("and", children)

    def _unary(self):
        k, _ = self._peek()
        if k == "NOT":
            self._take()
            return _Not(self._unary())
        if k == "lparen":
            self._take()
            node = self._or()
            self._take("rparen")
            return node
        return self._cmp()

    def _value(self):
        k, v = self._take()
        if k not in ("word", "value"):
            raise FilterSyntaxError(f"expected a value, got {v!r}")
        return v

    def _cmp(self):
        k, col = self._take()
        if k not in ("word", "value"):
            raise FilterSyntaxError(f"expected an attribute, got {col!r}")
        k, v = self._peek()
        if k == "op":
            self._take()
            return _Cmp(col, v, self._value())
        if k == "IN":
            self._take()
            self._take("lbrack")
            vals = [self._value()]
            while self._peek()[0] == "comma":
                self._take()
                vals.append(self._value())
            self._take("rbrack")
            return _In(col, vals)
        if k in ("word", "value"):  # `col lo TO hi`
            lo = self._value()
            self._take("TO")
            return _Range(col, lo, self._value())
        raise FilterSyntaxError(f"expected an operator after {col!r}")


def parse_filter(s: str):
    """Parse a Meilisearch filter expression string into an AST."""
    toks = _tokenize(s)
    if not toks:
        raise FilterSyntaxError("empty filter expression")
    return _Parser(toks).parse()


# ---- evaluation ----------------------------------------------------------

def _as_number(v: str) -> Optional[float]:
    try:
        return float(v)
    except ValueError:
        return None


def _col_values(store, col: str):
    vals = store.column(col)
    return vals, np.issubdtype(vals.dtype, np.number)


def _eq_ids(store, attr_index, col: str, value: str) -> np.ndarray:
    # The AttributeIndex stores Spark STRING casts of values, so numeric
    # columns must NOT resolve through it: `price = 20` would string-match
    # against "20.0" and silently return empty (and `price != 20` would
    # return every doc). Mirrors service._allowed's isinstance(value, str)
    # guard; dtype probe is parquet-footer-only (ADVICE r4, reproduced in
    # test_filter_expr.py::test_numeric_eq_on_indexed_column).
    if (attr_index is not None and col in attr_index.cols
            and not store.column_is_numeric(col)):
        return attr_index.doc_ids(col, value)
    vals, numeric = _col_values(store, col)
    if numeric:
        num = _as_number(value)
        if num is None:
            raise FilterSyntaxError(
                f"{col!r} is numeric; cannot compare to {value!r}")
        mask = vals == num
    else:
        mask = vals.astype(str) == value
    return store.doc_ids[mask]


_NUM_OPS = {
    ">": np.greater, ">=": np.greater_equal,
    "<": np.less, "<=": np.less_equal,
}


def evaluate_filter(node, store, attr_index=None) -> np.ndarray:
    """Resolve a parsed filter to the SORTED int64 doc ids satisfying it.
    `store` is an AttributeStore; `attr_index` an optional AttributeIndex
    for bucket-pruned equality resolution."""
    if isinstance(node, _Bool):
        parts = [evaluate_filter(c, store, attr_index)
                 for c in node.children]
        out = parts[0]
        for p in parts[1:]:
            out = (np.intersect1d(out, p) if node.op == "and"
                   else np.union1d(out, p))
        return out
    if isinstance(node, _Not):
        child = evaluate_filter(node.child, store, attr_index)
        return np.setdiff1d(store.doc_ids, child, assume_unique=True)
    if isinstance(node, _In):
        parts = [_eq_ids(store, attr_index, node.col, v)
                 for v in node.values]
        out = parts[0]
        for p in parts[1:]:
            out = np.union1d(out, p)
        return out
    if isinstance(node, _Range):
        vals, numeric = _col_values(store, node.col)
        lo, hi = _as_number(node.lo), _as_number(node.hi)
        if not numeric or lo is None or hi is None:
            raise FilterSyntaxError(
                f"TO ranges need a numeric column and bounds ({node.col!r})")
        return store.doc_ids[(vals >= lo) & (vals <= hi)]
    if isinstance(node, _Cmp):
        if node.op == "=":
            return _eq_ids(store, attr_index, node.col, node.value)
        if node.op == "!=":
            eq = _eq_ids(store, attr_index, node.col, node.value)
            return np.setdiff1d(store.doc_ids, eq, assume_unique=True)
        vals, numeric = _col_values(store, node.col)
        num = _as_number(node.value)
        if not numeric or num is None:
            raise FilterSyntaxError(
                f"ordering comparisons need a numeric column and value "
                f"({node.col!r} {node.op} {node.value!r})")
        return store.doc_ids[_NUM_OPS[node.op](vals, num)]
    raise TypeError(f"unknown filter node {node!r}")


def filter_attributes(node) -> set[str]:
    """Attribute names referenced by a parsed filter (for filterable
    validation — Meilisearch rejects expressions naming non-filterable
    attributes)."""
    if isinstance(node, _Bool):
        out: set[str] = set()
        for c in node.children:
            out |= filter_attributes(c)
        return out
    if isinstance(node, _Not):
        return filter_attributes(node.child)
    return {node.col}


def filter_ids(expr: str, store, attr_index=None) -> np.ndarray:
    """parse + evaluate in one call: sorted doc ids matching `expr`."""
    return evaluate_filter(parse_filter(expr), store, attr_index)
