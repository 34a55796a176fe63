"""Arrow-path operators: exact semantics pinned on tiny frames."""

from __future__ import annotations

from square_etl_spark.operators.arrow_ops import (
    group_median_deviation,
    token_count_arrow,
)


def test_group_median_even_and_odd_groups(spark):
    df = spark.createDataFrame(
        [(1, "en", 10), (2, "en", 20), (3, "en", 90),  # odd: median 20
         (4, "fr", 10), (5, "fr", 20)],                # even: midpoint 15.0
        ["doc_id", "lang", "n_chars"],
    )
    rows = {r.doc_id: r for r in group_median_deviation(df).collect()}
    assert rows[3].group_median == 20.0 and rows[3].dev == 70.0
    assert rows[4].group_median == 15.0 and rows[4].dev == -5.0
    # median is robust: the 90-char outlier does not move the center
    assert rows[1].dev == -10.0


def test_token_count_whitespace_runs_and_empties(spark):
    df = spark.createDataFrame(
        [(1, "a b  c"), (2, "  "), (3, ""), (4, " x\ty \n z "), (5, None)],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.n_tokens for r in token_count_arrow(df).collect()}
    assert got == {1: 3, 2: 0, 3: 0, 4: 3, 5: 0}
