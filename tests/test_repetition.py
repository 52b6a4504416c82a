"""Gopher-style repetition metrics (dedup.repetition_metrics): hand-built
cases + pure-python recompute, plus the no-shuffle plan assertion."""

import numpy as np
import pytest

from sparkft.dedup import repetition_metrics


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-repetition")
        .getOrCreate()
    )
    yield s


def round4(v):
    # HALF_UP like Spark's round() and DuckDB's round() — python's built-in
    # round() is banker's and diverges on exact ties (e.g. 1 - 3/32)
    import math
    return math.floor(v * 10000 + 0.5) / 10000


def py_metrics(text):
    w = [x for x in text.split() if x]
    row = {"n_words": len(w)}
    row["dup_word_frac"] = (
        round4(1.0 - len(set(w)) / len(w)) if w else 0.0)
    for n in (2, 3):
        grams = [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]
        row[f"dup_{n}gram_frac"] = (
            round4(1.0 - len(set(grams)) / len(grams)) if grams else 0.0)
    return row


CASES = [
    (0, "a b c d"),                # all distinct: fracs 0
    (1, "spam spam spam spam"),    # one word repeated: max duplication
    (2, "x y x y x y"),            # periodic: dup bigrams, dup trigrams
    (3, ""),                       # empty: all 0, no division error
    (4, "one"),                    # below n: n-gram fracs 0
    (5, "a  b\t c \n d a b"),      # whitespace runs collapse like split()
]


def test_hand_cases_and_python_parity(spark):
    df = spark.createDataFrame(CASES, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_metrics(df).collect()}
    for d, text in CASES:
        want = py_metrics(text)
        for k, v in want.items():
            assert got[d][k] == pytest.approx(v), (d, k)
    # spot-check the known values
    assert got[0]["dup_word_frac"] == 0.0
    assert got[1]["n_words"] == 4 and got[1]["dup_word_frac"] == 0.75
    assert got[1]["dup_2gram_frac"] == pytest.approx(round(1 - 1 / 3, 4))
    assert got[2]["dup_3gram_frac"] == pytest.approx(0.5)  # 4 grams, 2 kinds
    assert got[3] == {"doc_id": 3, "n_words": 0, "dup_word_frac": 0.0,
                      "dup_2gram_frac": 0.0, "dup_3gram_frac": 0.0}


def test_random_python_parity(spark):
    rng = np.random.default_rng(3)
    vocab = ["aa", "bb", "cc"]
    rows = [(i, " ".join(rng.choice(vocab, size=int(rng.integers(0, 40)))))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_metrics(df).collect()}
    for d, text in rows:
        for k, v in py_metrics(text).items():
            assert got[d][k] == pytest.approx(v), (d, k)


def test_no_shuffle_in_plan(spark):
    df = spark.createDataFrame(CASES, "doc_id long, text string")
    plan = repetition_metrics(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # per-row projection only