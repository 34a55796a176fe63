"""Partition-count invariance — the 1000-executor determinism pin.

Every ordered/ranked/folded result in the registry is supposed to be
a pure function of the DATA, never of the physical parallelism: rank
ties break on unique ids, float sums run through decimal
intermediates, fold consumption orders are md5-keyed (SURVEY.md §7).
The DuckDB oracle certifies that at ONE shuffle-partition setting;
this suite re-runs representative registered queries under a
different `spark.sql.shuffle.partitions` and asserts row-for-row
equality — the property that lets the same query return the same
answer on local[4] and on a 1000-executor cluster.

Representatives cover the order-sensitivity classes: window rank
(top-k), global agg with decimal sums, LSH-bucketed self-join +
distinct (dedup), TF-IDF ranking, a stored-index incremental fold,
and the IVF-PQ ANN probe (Lloyd iteration + argmin tie-breaks +
ADC).  r15 adds the K2 merge fold (anti-join + union + update-branch
stamp): the merge's survivors/stamps must not depend on which
partition a key's target and batch rows meet in.  r16 adds the CDC
fold (last-op-wins ordered by (ts, event_id), upsert/delete
dispatch): the one order-sensitive merge path the K2 class doesn't
cover — which event version survives, and whether a key survives at
all, must be partition-count-pure."""

import pytest

QUERIES = [
    "q1_pricing_summary",
    "topk_revenue_customers",
    "dedup_minhash_lsh",
    "text_tfidf_top_terms",
    "dedup_embedding_incremental",
    "ann_topk_ivfpq",
    "t2_tumbling_hourly",  # event-time windowed agg
    "sample_hash_documents",  # hash-keyed sampling determinism
    "quantile_sketch_orders",  # mergeable sketch: partial-agg order
    "k2_stamp_on_update",  # merge fold: anti-join + union + frozen stamp (r15)
    "cdc_apply_events",  # CDC fold: last-op-wins by (ts, event_id) (r16)
]


def _rows(spark, name, sf_dir, partitions):
    from square_etl_spark.queries import queries

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        df = queries()[name](spark, sf_dir)
        return sorted(map(tuple, df.collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_to_shuffle_partitions(spark, sf_dir, name):
    lo = _rows(spark, name, sf_dir, 3)
    hi = _rows(spark, name, sf_dir, 17)
    assert lo == hi, (
        f"{name}: result depends on spark.sql.shuffle.partitions — "
        "physical parallelism is leaking into values/ordering"
    )
