"""Physical-plan assertions: the optimizations we rely on at 100 TB must
actually appear in the executed plan (pushdown, pruning, broadcast,
partial aggregation, no Python in relational hot paths)."""

from __future__ import annotations

import pytest

from kafka_connect_fs_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushed_to_parquet_scan(spark):
    plan = plan_of(QUERIES["q1_pricing_summary"](spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q1_column_pruning_reads_only_needed_columns(spark):
    plan = plan_of(QUERIES["q1_pricing_summary"](spark, SF_DIR))
    scan = plan[plan.index("FileScan") :].split("\n")[0]
    assert "l_orderkey" not in scan and "l_partkey" not in scan
    assert "l_quantity" in scan


def test_region_rollup_broadcasts_dimensions(spark):
    plan = plan_of(QUERIES["region_revenue_rollup"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    # the fact table must NOT be shuffled for the join (only for the agg)
    assert "SortMergeJoin" not in plan


def test_lww_has_no_python_in_plan(spark):
    plan = plan_of(QUERIES["transcript_final_state"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_max_by" in plan


def test_whole_stage_codegen_in_text_pipeline(spark):
    plan = plan_of(QUERIES["text_quality"](spark, SF_DIR))
    assert "*(1)" in plan  # the '*(n)' prefix marks WholeStageCodegen stages
    assert "BatchEvalPython" not in plan


def test_dedup_exact_partial_aggregates(spark):
    plan = plan_of(QUERIES["dedup_exact"](spark, SF_DIR))
    assert "partial_count" in plan or "HashAggregate" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final
