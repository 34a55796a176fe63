"""Arrow-batched Python operators with SQL-checkable semantics.

The engine's rule is JVM-first: every reference-parity path is pure
built-in expressions (SURVEY.md §2.7), and Python appears only where
built-ins genuinely can't express the computation (custom codecs,
numpy kernels).  But when Python IS on the path, it must be held to
the same correctness bar — so this module demonstrates the two Arrow
fan-out shapes (grouped ``applyInPandas``, streaming ``mapInPandas``)
with operators whose results are **bit-deterministic** and therefore
fully DuckDB-oracle-checkable, unlike the rows-only multimodal stubs.

Determinism design: no float accumulations (order-dependent across
partitions).  The grouped op uses the per-group MEDIAN — an exact
selection statistic over integers (worst case an exact .5 midpoint),
identical in pandas and ANSI SQL — and integer subtraction.  The
row-wise op counts whitespace tokens: pure integer output.

Scale notes: ``applyInPandas`` shuffles once on the group key and
materializes ONE GROUP PER CALL in a worker's memory — fine for
bounded groups (languages, tenants), wrong for unbounded ones; skew
lands a whole hot group on one task, the usual salting caveat.
``mapInPandas`` is shuffle-free streaming over Arrow batches
(spark.sql.execution.arrow.maxRecordsPerBatch controls batch shape,
memory stays bounded at any corpus size).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def group_median_deviation(
    df: DataFrame,
    group_col: str = "lang",
    val_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group median and each row's deviation from it — the robust
    (outlier-proof) centering step of a quality-scoring pipeline,
    as a grouped Arrow operator.

    One shuffle on ``group_col``; each group is one pandas frame.
    Median over integers is exact selection arithmetic (no float-sum
    order dependence), so the output hash-matches an ANSI
    ``MEDIAN() OVER (PARTITION BY ...)`` oracle exactly.
    """
    schema = (
        f"{id_col} bigint, {group_col} string, {val_col} bigint, "
        "group_median double, dev double"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        med = float(pdf[val_col].median())
        out = pdf[[id_col, group_col, val_col]].copy()
        out["group_median"] = med
        out["dev"] = out[val_col].astype("float64") - med
        return out

    return df.groupBy(group_col).applyInPandas(fn, schema)


def token_count_arrow(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace token count per document via ``mapInPandas`` —
    the streaming Arrow shape (iterator of batches in, iterator out;
    no shuffle, memory bounded by the Arrow batch size).

    Matches ``str.split()`` semantics: split on whitespace runs,
    empties dropped — the same integer the SQL regexp twin computes,
    so the Python path is oracle-checked end to end.
    """
    schema = f"{id_col} bigint, n_tokens bigint"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_tokens": pdf[text_col].map(
                        lambda t: len(t.split()) if isinstance(t, str) else 0
                    ),
                }
            )

    return df.mapInPandas(fn, schema)
