"""Meilisearch filter-expression language (sparkft.filter_expr): parser
shapes, set-algebra evaluation vs a pandas-style recompute, error cases,
and the service string-filter surface."""

import numpy as np
import pytest

from sparkft.filter_expr import (FilterSyntaxError, filter_attributes,
                                 filter_ids, parse_filter)


class FakeStore:
    """Minimal AttributeStore stand-in: sorted doc_ids + columns."""

    def __init__(self, ids, cols):
        self.doc_ids = np.asarray(ids, dtype=np.int64)
        self._cols = {k: np.asarray(v) for k, v in cols.items()}

    def column(self, col):
        return self._cols[col]


@pytest.fixture()
def store():
    return FakeStore(
        ids=range(8),
        cols={
            "lang": ["en", "en", "de", "fr", "de", "en", "fr", "de"],
            "n": [10, 25, 30, 5, 25, 40, 25, 0],
        },
    )


def ids(expr, store):
    return filter_ids(expr, store).tolist()


def test_comparisons_and_boolean_algebra(store):
    assert ids("lang = en", store) == [0, 1, 5]
    assert ids("lang != en", store) == [2, 3, 4, 6, 7]
    assert ids("n > 25", store) == [2, 5]
    assert ids("n >= 25", store) == [1, 2, 4, 5, 6]
    assert ids("n < 10", store) == [3, 7]
    assert ids("n <= 10", store) == [0, 3, 7]
    assert ids("lang = en AND n >= 25", store) == [1, 5]
    assert ids("lang = fr OR n > 25", store) == [2, 3, 5, 6]
    assert ids("NOT lang = en", store) == [2, 3, 4, 6, 7]
    assert ids("(lang = en OR lang = de) AND NOT n = 25", store) == \
        [0, 2, 5, 7]
    assert ids("lang IN [de, fr]", store) == [2, 3, 4, 6, 7]
    assert ids("n 10 TO 30", store) == [0, 1, 2, 4, 6]  # inclusive range
    # quoted values with spaces/escapes
    assert ids("lang = 'en'", store) == [0, 1, 5]
    assert ids('lang = "en"', store) == [0, 1, 5]
    # AND binds tighter than OR
    assert ids("lang = fr OR lang = en AND n > 20", store) == \
        sorted(set(ids("lang = fr", store))
               | set(ids("lang = en AND n > 20", store)))


def test_attribute_collection_and_errors(store):
    assert filter_attributes(
        parse_filter("(a = 1 OR b > 2) AND NOT c IN [x]")) == {"a", "b", "c"}
    for bad in ("", "lang =", "= en", "lang = en AND", "(lang = en",
                "lang IN [", "n 10 TO", "lang ~ en"):
        with pytest.raises(FilterSyntaxError):
            filter_ids(bad, store)
    with pytest.raises(FilterSyntaxError, match="numeric"):
        filter_ids("n = abc", store)
    with pytest.raises(FilterSyntaxError, match="numeric"):
        filter_ids("lang > 3", store)
    with pytest.raises(FilterSyntaxError, match="range"):
        filter_ids("lang en TO fr", store)


def test_random_parity_against_pandas(store):
    rng = np.random.default_rng(5)
    n = 200
    big = FakeStore(
        ids=(rng.permutation(10**6)[:n] * 7).tolist(),
        cols={"x": rng.integers(0, 50, n), "s": rng.choice(["a", "b"], n)},
    )
    big.doc_ids = np.sort(big.doc_ids)
    import pandas as pd

    df = pd.DataFrame({"doc_id": big.doc_ids, "x": big._cols["x"],
                       "s": big._cols["s"]})
    cases = {
        "x >= 25 AND s = a": (df.x >= 25) & (df.s == "a"),
        "NOT (x < 10 OR s = b)": ~((df.x < 10) | (df.s == "b")),
        "x 5 TO 15 OR s = b": ((df.x >= 5) & (df.x <= 15)) | (df.s == "b"),
        "x IN [1, 2, 3]": df.x.isin([1, 2, 3]),
    }
    for expr, mask in cases.items():
        assert filter_ids(expr, big).tolist() == \
            df.loc[mask, "doc_id"].tolist(), expr


def test_service_string_filter(tmp_path):
    """SearchService accepts a filter STRING; equals the same allowed set
    composed manually; non-filterable attributes in the expression are
    rejected by name."""
    from pyspark.sql import SparkSession

    from sparkft.corpus import generate_corpus
    from sparkft.facets import write_attribute_store
    from sparkft.index_build import build_index
    from sparkft.search import IndexReader, filtered_topk
    from sparkft.service import IndexSettings, SearchService

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    corpus = generate_corpus(200, seed=77)
    out = str(tmp_path / "fidx")
    docs = spark.createDataFrame(corpus)
    build_index(spark, docs, out, num_shards=1, num_buckets=4)
    from pyspark.sql import functions as F

    attrs = (docs.withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
             .select("doc_id", "lang",
                     F.length("content").alias("n_chars")))
    write_attribute_store(spark, attrs, out, cols=("lang", "n_chars"))
    svc = SearchService(out, IndexSettings(
        filterable_attributes=("lang", "n_chars")))
    expr = "lang = py AND n_chars >= 300"
    res = svc.search("merge sort", 10, filter=expr)
    reader = IndexReader(None, out)
    allowed = svc._allowed(expr)
    want = filtered_topk(reader, "merge sort", 10, allowed_docs=np.fromiter(
        allowed, dtype=np.int64, count=len(allowed)))
    assert [(h["doc_id"], h["score"]) for h in res["hits"]] == \
        [(d, round(s, 4)) for d, s in want] or \
        [(h["doc_id"], h["score"]) for h in res["hits"]] == want
    with pytest.raises(ValueError, match="not filterable"):
        svc.search("merge", 5, filter="secret_col = 1")

class FakeIndex:
    """AttributeIndex stand-in whose values are Spark STRING casts —
    numeric 25 is stored as "25" (int col) or "25.0" (double col)."""

    def __init__(self, store, cols):
        self.cols = tuple(cols)
        self._store = store

    def doc_ids(self, attr, value):
        vals = self._store.column(attr).astype(str)
        return np.sort(self._store.doc_ids[vals == str(value)])


def test_numeric_eq_on_indexed_column(store):
    """ADVICE r4 (medium): an INDEXED numeric column must not resolve
    equality through the string-cast AttributeIndex — `n = 25.0` would
    string-match "25" vs "25.0" and silently return empty, and `n != 25.0`
    would return every doc including matches."""
    store.column_is_numeric = lambda col: np.issubdtype(
        store._cols[col].dtype, np.number)
    idx = FakeIndex(store, cols=("lang", "n"))
    # the float form of the literal is where the old index path broke
    assert filter_ids("n = 25.0", store, idx).tolist() == [1, 4, 6]
    assert filter_ids("n != 25.0", store, idx).tolist() == [0, 2, 3, 5, 7]
    assert filter_ids("n IN [25.0, 40]", store, idx).tolist() == [1, 4, 5, 6]
    # string columns still go through the index (bucket-pruned path)
    assert filter_ids("lang = en", store, idx).tolist() == [0, 1, 5]


def test_real_store_numeric_dtype_probe(tmp_path):
    """column_is_numeric on a REAL AttributeStore is parquet-footer-only
    and correct for int/string columns."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from sparkft.facets import (AttributeIndex, AttributeStore,
                                write_attribute_index, write_attribute_store)

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    docs = spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("l"), (F.col("id") % 3).cast("string")).alias("lang"),
        (F.col("id") % 4 * 10).cast("double").alias("price"),
    )
    out = str(tmp_path / "numidx")
    write_attribute_store(spark, docs, out, cols=("lang", "price"))
    write_attribute_index(spark, docs, out, cols=("lang", "price"))
    st, ai = AttributeStore(out), AttributeIndex(out)
    assert st.column_is_numeric("price") and not st.column_is_numeric("lang")
    assert filter_ids("price = 20", st, ai).tolist() == \
        sorted(i for i in range(20) if (i % 4) * 10 == 20)
    assert filter_ids("price != 20", st, ai).tolist() == \
        sorted(i for i in range(20) if (i % 4) * 10 != 20)
    assert filter_ids("lang = l1", st, ai).tolist() == \
        sorted(i for i in range(20) if i % 3 == 1)


# --- hypothesis: random expression ASTs, engine vs pandas oracle ---

from hypothesis import given, settings
from hypothesis import strategies as st


def _leaf_num(op, k):
    import operator

    fns = {"=": operator.eq, "!=": operator.ne, "<": operator.lt,
           "<=": operator.le, ">": operator.gt, ">=": operator.ge}
    return (f"x {op} {k}", lambda df, f=fns[op], kk=k: f(df.x, kk))


_num_leaf = st.tuples(
    st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
    st.integers(0, 50)).map(lambda t: _leaf_num(*t))
_range_leaf = st.tuples(st.integers(0, 50), st.integers(0, 50)).map(
    lambda t: (f"x {min(t)} TO {max(t)}",
               lambda df, lo=min(t), hi=max(t): (df.x >= lo) & (df.x <= hi)))
_num_in_leaf = st.lists(st.integers(0, 50), min_size=1, max_size=4).map(
    lambda ks: (f"x IN [{', '.join(map(str, ks))}]",
                lambda df, kk=tuple(ks): df.x.isin(kk)))
_str_leaf = st.tuples(st.sampled_from(["=", "!="]),
                      st.sampled_from(["a", "b", "c"])).map(
    lambda t: (f"s {t[0]} {t[1]}",
               lambda df, o=t[0], v=t[1]:
               (df.s == v) if o == "=" else (df.s != v)))
_str_in_leaf = st.lists(st.sampled_from(["a", "b", "c"]),
                        min_size=1, max_size=3).map(
    lambda vs: (f"s IN [{', '.join(vs)}]",
                lambda df, vv=tuple(vs): df.s.isin(vv)))

_leaves = st.one_of(_num_leaf, _range_leaf, _num_in_leaf,
                    _str_leaf, _str_in_leaf)


def _combine(children):
    return st.one_of(
        st.tuples(children, children, st.sampled_from(["AND", "OR"])).map(
            lambda t: (f"({t[0][0]}) {t[2]} ({t[1][0]})",
                       lambda df, a=t[0][1], b=t[1][1], op=t[2]:
                       (a(df) & b(df)) if op == "AND" else (a(df) | b(df)))),
        children.map(lambda c: (f"NOT ({c[0]})",
                                lambda df, a=c[1]: ~a(df))),
    )


_exprs = st.recursive(_leaves, _combine, max_leaves=8)


@settings(max_examples=300, deadline=None)
@given(_exprs, st.randoms(use_true_random=False))
def test_random_expressions_match_pandas_oracle(expr_mask, rnd):
    """Parser + set-algebra evaluator vs a pandas mask built from the SAME
    random AST — any divergence in precedence, range/IN semantics, NOT
    complement, or the numeric-vs-index routing shows up here."""
    import pandas as pd

    n = 60
    xs = [rnd.randrange(0, 51) for _ in range(n)]
    ss = [rnd.choice("abc") for _ in range(n)]
    store = FakeStore(ids=range(0, 2 * n, 2), cols={"x": xs, "s": ss})
    df = pd.DataFrame({"doc_id": store.doc_ids, "x": xs, "s": ss})
    expr, mask_fn = expr_mask
    got = filter_ids(expr, store).tolist()
    want = df.loc[mask_fn(df), "doc_id"].tolist()
    assert got == want, expr


# ---- v0.29/v1.0/v1.11/v1.12 operators: EXISTS / IS NULL / IS EMPTY /
# ---- NOT IN / CONTAINS / STARTS WITH ---------------------------------------

@pytest.fixture()
def nullable_store():
    """Object-dtype string column with None holes + float column with NaN
    holes — the exact shapes pyarrow hands AttributeStore for parquet
    nulls — plus an int column (cannot hold nulls at all)."""
    return FakeStore(
        ids=range(8),
        cols={
            "tag": np.array(["py", "rs", None, "", "pyx", "java", None,
                             "go"], dtype=object),
            "price": np.array([1.0, 2.0, np.nan, 4.0, 5.0, np.nan, 7.0,
                               8.0]),
            "n": np.arange(8),
        },
    )


def test_exists_and_null_operators(nullable_store):
    s = nullable_store
    assert ids("tag EXISTS", s) == [0, 1, 3, 4, 5, 7]
    assert ids("tag NOT EXISTS", s) == [2, 6]
    assert ids("tag IS NULL", s) == [2, 6]
    assert ids("tag IS NOT NULL", s) == [0, 1, 3, 4, 5, 7]
    assert ids("price IS NULL", s) == [2, 5]
    assert ids("price EXISTS", s) == [0, 1, 3, 4, 6, 7]
    # int64 columns cannot hold a null
    assert ids("n IS NULL", s) == []
    assert ids("n EXISTS", s) == list(range(8))
    # upstream: NOT is the complement over all documents, so NOT on a
    # value predicate INCLUDES the null docs
    assert ids("NOT tag = py", s) == [1, 2, 3, 4, 5, 6, 7]


def test_is_empty(nullable_store):
    s = nullable_store
    assert ids("tag IS EMPTY", s) == [3]
    # null is NOT empty (upstream: IS EMPTY does not match missing/null)
    assert ids("tag IS NOT EMPTY", s) == [0, 1, 2, 4, 5, 6, 7]
    assert ids("price IS EMPTY", s) == []  # numbers are never empty


def test_contains_and_starts_with(nullable_store):
    s = nullable_store
    assert ids("tag CONTAINS py", s) == [0, 4]
    assert ids("tag CONTAINS 'a'", s) == [5]
    assert ids("tag NOT CONTAINS py", s) == [1, 2, 3, 5, 6, 7]
    assert ids("tag STARTS WITH py", s) == [0, 4]
    assert ids("tag NOT STARTS WITH 'py'", s) == [1, 2, 3, 5, 6, 7]
    # empty-string value: every non-null doc contains/starts-with ""
    assert ids("tag CONTAINS ''", s) == [0, 1, 3, 4, 5, 7]
    with pytest.raises(FilterSyntaxError, match="string"):
        ids("price CONTAINS 1", s)


def test_not_in_and_null_safety(nullable_store):
    s = nullable_store
    assert ids("tag NOT IN [py, rs]", s) == [2, 3, 4, 5, 6, 7]
    # a None cell must not stringify to 'None' and match the bare word
    assert ids("tag = None", s) == []
    assert ids("tag != None", s) == list(range(8))


def test_new_operator_syntax_errors(nullable_store):
    s = nullable_store
    for bad in ("tag IS", "tag IS BOGUS", "tag IS NOT BOGUS",
                "tag NOT > 3", "tag STARTS py", "tag STARTS WITH",
                "tag CONTAINS", "EXISTS", "tag NOT", "tag NOT IN x"):
        with pytest.raises(FilterSyntaxError):
            filter_ids(bad, s)
    # reserved words must be quoted to be used as values
    with pytest.raises(FilterSyntaxError):
        filter_ids("tag = NULL", s)
    assert ids("tag = 'NULL'", s) == []


def test_contains_feature_gate(nullable_store):
    """parse_filter(allow_contains=False) rejects CONTAINS / STARTS WITH
    anywhere in the tree with upstream's containsFilter message; every
    other operator still parses."""
    for expr in ("tag CONTAINS py", "tag STARTS WITH py",
                 "n > 3 AND (tag CONTAINS py OR tag = rs)",
                 "NOT tag NOT CONTAINS py"):
        with pytest.raises(FilterSyntaxError, match="containsFilter"):
            parse_filter(expr, allow_contains=False)
    for expr in ("tag EXISTS", "tag IS NULL", "tag IS EMPTY",
                 "tag NOT IN [py]", "n 1 TO 3"):
        parse_filter(expr, allow_contains=False)


def test_new_operators_collect_attributes():
    assert filter_attributes(parse_filter(
        "a EXISTS AND (b IS NULL OR c CONTAINS x) AND d STARTS WITH y "
        "AND e NOT IN [1]")) == {"a", "b", "c", "d", "e"}
