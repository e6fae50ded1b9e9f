"""Input-source dispatch (graph/sources.py) — the InputSourceFactory
analogue: every supported source kind must yield the identical
canonical transcript DataFrame."""

from __future__ import annotations

import pytest

from hugegraph_computer_spark.graph import read_transcripts
from tests.conftest import make_transcripts

ROWS = [
    ("c1", 0, "user", None),
    ("c1", 1, "assistant", "search"),
    ("c1", 2, "user", None),
    ("c2", 0, "system", "sql"),
    ("c2", 1, "agent_0", None),
]


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def base(spark):
    return make_transcripts(spark, ROWS)


def test_parquet_csv_json_sources_agree(spark, base, tmp_path_factory):
    d = tmp_path_factory.mktemp("src")
    expect = _canon(base)
    base.write.parquet(str(d / "t.parquet"))
    base.write.option("header", True).csv(str(d / "t.csv"))
    base.write.json(str(d / "t.json"))
    for name in ("t.parquet", "t.csv", "t.json"):
        got = read_transcripts(spark, str(d / name))
        assert got.columns == [
            "conv_id", "turn_idx", "role", "text", "tool", "ts",
        ]
        assert _canon(got) == expect, name
        # csv/json arrive string-typed on disk; the loader must cast
        assert dict(got.dtypes)["turn_idx"] == "int"


def test_catalog_table_source(spark, base):
    """The Iceberg/production path: spark.read.table(name). Locally the
    catalog table is parquet-backed (no Iceberg jar in the test env) —
    read.table is format-agnostic, which is the point."""
    base.write.mode("overwrite").saveAsTable("transcripts_src_test")
    try:
        got = read_transcripts(spark, "transcripts_src_test")
        assert _canon(got) == _canon(base)
        # explicit prefix and fmt= force the same dispatch
        assert _canon(read_transcripts(spark, "table:transcripts_src_test")) == _canon(base)
        assert _canon(
            read_transcripts(spark, "transcripts_src_test", fmt="table")
        ) == _canon(base)
    finally:
        spark.sql("DROP TABLE IF EXISTS transcripts_src_test")


def test_extra_columns_pruned_and_missing_rejected(spark, base, tmp_path_factory):
    d = tmp_path_factory.mktemp("srcx")
    from pyspark.sql import functions as F

    base.withColumn("extra", F.lit(1)).write.parquet(str(d / "wide.parquet"))
    got = read_transcripts(spark, str(d / "wide.parquet"))
    assert "extra" not in got.columns
    assert _canon(got) == _canon(base)

    base.drop("role").write.parquet(str(d / "narrow.parquet"))
    with pytest.raises(ValueError, match="missing required columns.*role"):
        read_transcripts(spark, str(d / "narrow.parquet"))
