"""Sink + property-combiner tests (reference R15-R18)."""

from __future__ import annotations

import os
import shutil
import tempfile

from hugegraph_computer_spark.engine.io import (
    combine_properties,
    csv_output,
    log_output,
    results_table_output,
)


def test_log_output_prints_rows_and_honors_limit(spark, capsys):
    """R15 LogOutput/LimitedLogOutput: rows reach the log and the
    limit caps them (LimitedLogOutput truncation)."""
    df = spark.createDataFrame(
        [("v1", 0.5), ("v2", 0.25)], "id string, rank double"
    )
    log_output(df.orderBy("id"), limit=1)
    out = capsys.readouterr().out
    assert "v1" in out and "0.5" in out
    assert "v2" not in out  # limited to 1 row


def _dups(spark):
    return spark.createDataFrame(
        [
            ("v1", 1, "a"),
            ("v1", 2, None),
            ("v1", None, "c"),
            ("v2", 7, "x"),
        ],
        "id string, p1 int, p2 string",
    )


def test_combine_overwrite(spark):
    out = {r["id"]: (r["p1"], r["p2"]) for r in combine_properties(_dups(spark), ["id"], "overwrite").collect()}
    assert out["v2"] == (7, "x")
    assert out["v1"] == (2, None)  # max struct == last by (p1,p2) order


def test_combine_merge_old_new(spark):
    old = {r["id"]: (r["p1"], r["p2"]) for r in combine_properties(_dups(spark), ["id"], "merge_old").collect()}
    new = {r["id"]: (r["p1"], r["p2"]) for r in combine_properties(_dups(spark), ["id"], "merge_new").collect()}
    # deterministic order: rows sorted by (p1 nulls..., p2) before agg
    assert old["v1"][0] is not None and old["v1"][1] is not None
    assert new["v1"][0] is not None and new["v1"][1] is not None
    assert old["v2"] == new["v2"] == (7, "x")


def test_combine_all_null_group(spark):
    """A value column NULL in every row of a key group must combine to
    NULL (sparse properties — the case the merge combiners exist for),
    not throw: under Spark 4 ANSI mode element_at over the empty
    collect_list array raises INVALID_ARRAY_INDEX_IN_ELEMENT_AT;
    try_element_at restores the old first/last(ignorenulls) NULL."""
    df = spark.createDataFrame(
        [("v1", None, "a"), ("v1", None, "b"), ("v2", 5, None)],
        "id string, p1 int, p2 string",
    )
    for mode in ("merge_old", "merge_new"):
        out = {
            r["id"]: (r["p1"], r["p2"])
            for r in combine_properties(df, ["id"], mode).collect()
        }
        assert out["v1"][0] is None and out["v1"][1] in ("a", "b")
        assert out["v2"] == (5, None)


def test_csv_sink_merge_and_blank_filter(spark):
    d = tempfile.mkdtemp(prefix="hcs_csv_")
    try:
        df = spark.createDataFrame(
            [("a", "1"), ("b", ""), ("c", None), ("d", "4")], "id string, val string"
        )
        csv_output(df, os.path.join(d, "out"), merge_partitions=True, filter_blank="val")
        parts = [
            f for f in os.listdir(os.path.join(d, "out")) if f.startswith("part-")
        ]
        assert len(parts) == 1  # merged (HdfsOutputMerger analogue)
        back = spark.read.option("header", True).csv(os.path.join(d, "out"))
        assert {r["id"] for r in back.collect()} == {"a", "d"}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_results_table_sink(spark):
    d = tempfile.mkdtemp(prefix="hcs_res_")
    try:
        df = spark.createDataFrame([("v1", 0.5)], "id string, rank double")
        results_table_output(df, d, "page_rank")
        results_table_output(df, d, "wcc")
        back = spark.read.parquet(d)
        assert back.count() == 2
        assert {r["algorithm"] for r in back.collect()} == {"page_rank", "wcc"}
    finally:
        shutil.rmtree(d, ignore_errors=True)
