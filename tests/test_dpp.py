"""Dynamic partition pruning: the day-partitioned fact scan must carry
a runtime partition filter injected from the filtered dim side."""

from __future__ import annotations

from data_ingestion_resolution_platform_spark.plans.queries import q_dpp_prune_join


def test_fact_scan_is_dynamically_pruned(spark, sf_dir):
    df = q_dpp_prune_join(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the result only contains qualifying days
    for r in df.collect():
        assert (r["day"].toordinal() - 719163) % 3 == 0  # 719163 = 1970-01-01
        assert r["n_events"] > 0
