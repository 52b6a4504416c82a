"""The r6 Arrow driver-transfer collect (guide §4.1/§6) must be
value-identical AND type-identical to the classic pickled-row collect for
every schema it opts into, and must fall back (not break) for the rest."""

import datetime
import decimal
import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .appName("test-arrow-collect")
        .getOrCreate()
    )
    yield s


def _check_identical(df):
    from __spark_entry__ import _ArrowCollectFrame, _fast

    ref = df.collect()
    fast_df = _fast(df)
    assert isinstance(fast_df, _ArrowCollectFrame)
    got = fast_df.collect()
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        assert a == b
        assert a.asDict() == b.asDict()
        for x, y in zip(a, b):
            assert type(x) is type(y), (x, y)
    return got


def test_safe_types_identical(spark):
    df = spark.createDataFrame(
        [
            (1, 2, 3.5, "s", True, datetime.date(2020, 1, 2),
             datetime.datetime(2021, 3, 4, 5, 6, 7, 123456),
             decimal.Decimal("12.34"), [1, 2, 3], ["a", None]),
            (None, None, None, None, None, None, None, None, None, None),
        ],
        "a long, b int, c double, d string, e boolean, f date, "
        "g timestamp_ntz, h decimal(10,2), i array<long>, j array<string>",
    )
    got = _check_identical(df)
    # field access by name must work (class-level __fields__)
    assert got[0].a == 1 and got[0]["d"] == "s"


def test_unsafe_types_fall_back(spark):
    from pyspark.sql import functions as F

    from __spark_entry__ import _fast

    # struct + binary + TIMESTAMP (ltz) are outside the verified set
    df = spark.createDataFrame([(1,)], "x long").select(
        F.struct(F.col("x")).alias("s"),
        F.lit(bytearray(b"ab")).alias("b"),
        F.lit(datetime.datetime(2021, 1, 1)).cast("timestamp").alias("t"),
    )
    ref = df.collect()
    got = _fast(df).collect()
    assert ref == got
    for x, y in zip(ref[0], got[0]):
        assert type(x) is type(y)


def test_empty_result(spark):
    from __spark_entry__ import _fast

    df = spark.range(10).filter("id < 0")
    assert _fast(df).collect() == []


def test_rows_pickle_roundtrip(spark):
    import pickle

    from __spark_entry__ import _fast

    df = spark.createDataFrame([(1, "a")], "x long, y string")
    got = _fast(df).collect()
    rt = pickle.loads(pickle.dumps(got))
    assert rt == got
    assert rt[0].asDict() == {"x": 1, "y": "a"}


def test_queries_registry_wrapped(spark):
    """Every declared query comes out of queries() Arrow-collect wrapped."""
    import __spark_entry__ as entry

    qs = entry.queries()
    df = qs["pricing_summary"](spark, "/root/testdata/sf0.001")
    assert isinstance(df, entry._ArrowCollectFrame)
    ref = entry._pricing_summary(spark, "/root/testdata/sf0.001").collect()
    got = df.collect()
    assert sorted(map(tuple, ref)) == sorted(map(tuple, got))


def test_null_free_numpy_fast_path_identical(spark):
    """NULL-free columns take the ndarray.tolist() fast path — values and
    types must still match the classic collect exactly."""
    import datetime

    df = spark.createDataFrame(
        [(i, float(i) / 3, f"s{i}", i % 2 == 0,
          datetime.date(2020, 1, 1 + i % 27),
          datetime.datetime(2021, 3, 4, 5, 6, 7, i * 13 % 1000000))
         for i in range(500)],
        "a long, b double, c string, d boolean, e date, f timestamp_ntz",
    )
    _check_identical(df)


def test_mixed_null_columns_fall_to_pylist(spark):
    df = spark.createDataFrame(
        [(1, 1.5, "x"), (None, None, None)],
        "a long, b double, c string")
    got = _check_identical(df)
    assert got[1].a is None and got[1].b is None and got[1].c is None
