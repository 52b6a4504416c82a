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
            | ident ["NOT"] "IN" "[" value ("," value)* "]"
            | ident value "TO" value          (inclusive range, Meilisearch)
            | ident ["NOT"] "EXISTS"                        (v0.29)
            | ident "IS" ["NOT"] ("NULL" | "EMPTY")         (v1.0)
            | ident ["NOT"] "CONTAINS" value                (v1.11, gated)
            | ident ["NOT"] "STARTS" "WITH" value           (v1.12, gated)
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

Null semantics in the columnar data model: Meilisearch documents are JSON,
where a field can be MISSING or explicitly null and `EXISTS` distinguishes
the two. The attribute store is columnar (every doc has every column; the
only representable absence is null), so here `EXISTS` ≡ `IS NOT NULL` —
a documented divergence. `IS EMPTY` matches the empty string (upstream also
matches [] / {}, which the scalar attribute store does not hold). CONTAINS
and STARTS WITH are case-sensitive byte matches, consistent with this
module's `=` (Meilisearch upstream gates both behind the `containsFilter`
experimental feature — enforced at the service layer via
`parse_filter(allow_contains=False)`, see registry.experimental_features).
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

_KEYWORDS = {"AND", "OR", "NOT", "IN", "TO", "EXISTS", "IS", "NULL",
             "EMPTY", "CONTAINS", "STARTS", "WITH"}


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


class _Exists:
    __slots__ = ("col",)

    def __init__(self, col):
        self.col = col


class _IsNull:
    __slots__ = ("col",)

    def __init__(self, col):
        self.col = col


class _IsEmpty:
    __slots__ = ("col",)

    def __init__(self, col):
        self.col = col


class _Str:
    __slots__ = ("col", "kind", "value")  # kind: 'contains' | 'starts'

    def __init__(self, col, kind, value):
        self.col, self.kind, self.value = col, kind, value


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

    def _in_list(self, col):
        self._take("lbrack")
        vals = [self._value()]
        while self._peek()[0] == "comma":
            self._take()
            vals.append(self._value())
        self._take("rbrack")
        return _In(col, vals)

    def _starts_with(self, col):
        self._take("STARTS")
        self._take("WITH")
        return _Str(col, "starts", self._value())

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
            return self._in_list(col)
        if k == "EXISTS":
            self._take()
            return _Exists(col)
        if k == "CONTAINS":
            self._take()
            return _Str(col, "contains", self._value())
        if k == "STARTS":
            return self._starts_with(col)
        if k == "NOT":  # postfix-NOT forms: NOT IN / NOT EXISTS / NOT
            self._take()  # CONTAINS / NOT STARTS WITH (upstream grammar)
            k2, v2 = self._peek()
            if k2 == "IN":
                self._take()
                return _Not(self._in_list(col))
            if k2 == "EXISTS":
                self._take()
                return _Not(_Exists(col))
            if k2 == "CONTAINS":
                self._take()
                return _Not(_Str(col, "contains", self._value()))
            if k2 == "STARTS":
                return _Not(self._starts_with(col))
            raise FilterSyntaxError(
                f"expected IN/EXISTS/CONTAINS/STARTS WITH after "
                f"{col!r} NOT, got {v2!r}")
        if k == "IS":  # IS [NOT] NULL | IS [NOT] EMPTY
            self._take()
            neg = False
            if self._peek()[0] == "NOT":
                self._take()
                neg = True
            k2, v2 = self._peek()
            if k2 == "NULL":
                self._take()
                node = _IsNull(col)
            elif k2 == "EMPTY":
                self._take()
                node = _IsEmpty(col)
            else:
                raise FilterSyntaxError(
                    f"expected NULL or EMPTY after {col!r} IS, got {v2!r}")
            return _Not(node) if neg else node
        if k in ("word", "value"):  # `col lo TO hi`
            lo = self._value()
            self._take("TO")
            return _Range(col, lo, self._value())
        raise FilterSyntaxError(f"expected an operator after {col!r}")


def parse_filter(s: str, allow_contains: bool = True):
    """Parse a Meilisearch filter expression string into an AST.

    `allow_contains=False` rejects CONTAINS / STARTS WITH with upstream's
    feature-gate error (Meilisearch serves both only when the
    `containsFilter` experimental feature is enabled; the registry/service
    layer passes its flag through here — library callers default to
    permissive)."""
    toks = _tokenize(s)
    if not toks:
        raise FilterSyntaxError("empty filter expression")
    node = _Parser(toks).parse()
    if not allow_contains and _uses_contains(node):
        raise FilterSyntaxError(
            "using `CONTAINS` or `STARTS WITH` in a filter requires "
            "enabling the `containsFilter` experimental feature")
    return node


def _uses_contains(node) -> bool:
    if isinstance(node, _Str):
        return True
    if isinstance(node, _Bool):
        return any(_uses_contains(c) for c in node.children)
    if isinstance(node, _Not):
        return _uses_contains(node.child)
    return False


# ---- evaluation ----------------------------------------------------------

def _as_number(v: str) -> Optional[float]:
    try:
        return float(v)
    except ValueError:
        return None


def _col_values(store, col: str):
    vals = store.column(col)
    return vals, np.issubdtype(vals.dtype, np.number)


def _null_mask(vals: np.ndarray) -> np.ndarray:
    """True where the stored value is null. Parquet nulls surface as NaN in
    float columns and as None objects in string/object columns (pyarrow →
    numpy conversion in AttributeStore._load_bucket); a non-object,
    non-float dtype (int64, <U…) cannot hold a null at all."""
    if np.issubdtype(vals.dtype, np.floating):
        return np.isnan(vals)
    if vals.dtype == object:
        return np.frompyfunc(lambda v: v is None, 1, 1)(vals).astype(bool)
    return np.zeros(len(vals), dtype=bool)


def _notnull_str(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(non-null mask, the non-null values as a str array) — the gather the
    CONTAINS / STARTS WITH / IS EMPTY matchers run on."""
    nn = ~_null_mask(vals)
    return nn, vals[nn].astype(str)


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
        return store.doc_ids[vals == num]
    # null-safe string equality: a None in an object column must not
    # stringify to 'None' and match the literal word
    nn, s = _notnull_str(vals)
    return store.doc_ids[nn][s == value]


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
    if isinstance(node, _Exists):
        # columnar model: EXISTS ≡ IS NOT NULL (module docstring)
        return store.doc_ids[~_null_mask(store.column(node.col))]
    if isinstance(node, _IsNull):
        return store.doc_ids[_null_mask(store.column(node.col))]
    if isinstance(node, _IsEmpty):
        vals, numeric = _col_values(store, node.col)
        if numeric:  # a number is never the empty string / empty array
            return np.empty(0, dtype=np.int64)
        nn, s = _notnull_str(vals)
        ids = store.doc_ids[nn]
        return ids[s == ""]
    if isinstance(node, _Str):
        vals, numeric = _col_values(store, node.col)
        if numeric:
            raise FilterSyntaxError(
                f"CONTAINS/STARTS WITH need a string column ({node.col!r})")
        nn, s = _notnull_str(vals)
        ids = store.doc_ids[nn]
        if node.kind == "starts":
            return ids[np.char.startswith(s, node.value)]
        return ids[np.char.find(s, node.value) >= 0]
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
