"""Physical-plan shape assertions (SURVEY.md §4.2-§4.3).

Correctness says what is computed; these tests pin HOW — the plan
properties that decide whether an operator survives a 100× scale-up:
filters pushed to the parquet scan, columns pruned, dims broadcast,
global top-k as TakeOrderedAndProject, whole-stage codegen engaged.
"""

from __future__ import annotations

import pytest

from systematic_review_classification_spark import all_queries

QUERIES = all_queries()


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_scan_pushdown_and_pruning(spark, sf_dir):
    plan = plan_of(QUERIES["scan_parquet"](spark, sf_dir))
    assert "PushedFilters" in plan and "GreaterThan(l_quantity,45.0)" in plan, plan
    # projection prunes to the 4 referenced columns
    assert "l_tax" not in plan and "l_shipdate" not in plan, plan


def test_flagship_pushdown(spark, sf_dir):
    plan = plan_of(QUERIES["agg_pricing_summary"](spark, sf_dir))
    assert "PushedFilters" in plan and "LessThanOrEqual(l_shipdate" in plan, plan
    assert "l_partkey" not in plan, "ReadSchema should prune unused columns"


def test_broadcast_join_plan(spark, sf_dir):
    plan = plan_of(QUERIES["join_broadcast"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_multiway_all_broadcast(spark, sf_dir):
    plan = plan_of(QUERIES["join_multiway"](spark, sf_dir))
    # formatted mode prints each node in tree + detail → 2x per join
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "SortMergeJoin" not in plan, "dims must broadcast, not shuffle the fact"


def test_sortmerge_hint_respected(spark, sf_dir):
    plan = plan_of(QUERIES["join_sortmerge"](spark, sf_dir))
    assert "SortMergeJoin" in plan, plan


def test_shuffle_hash_hint_respected(spark, sf_dir):
    plan = plan_of(QUERIES["join_shuffle_hash"](spark, sf_dir))
    assert "ShuffledHashJoin" in plan, plan


def test_topk_is_take_ordered(spark, sf_dir):
    plan = plan_of(QUERIES["limit_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("Exchange") == 0, "global top-k must not shuffle"


def test_codegen_engaged(spark, sf_dir):
    df = QUERIES["agg_pricing_summary"](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "codegen")
    assert "WholeStageCodegen" in plan, plan


def test_partial_aggregation(spark, sf_dir):
    plan = plan_of(QUERIES["agg_pricing_summary"](spark, sf_dir))
    # partial (map-side) agg before the exchange, final after
    assert plan.count("HashAggregate") >= 2, plan


def test_bucketed_join_no_shuffle(spark, sf_dir):
    df = QUERIES["join_bucketed"](spark, sf_dir)
    plan = plan_of(df)
    assert "SortMergeJoin" in plan, plan
    # bucket layout feeds the join directly: no Exchange below the join
    join_part = plan.split("SortMergeJoin")[0]
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "SelectedBucketsCount" in plan, plan
