"""Input-source dispatch for the transcript table.

The reference dispatches its graph input on ``input.source.type``
(InputSourceFactory.java:31-56: "hugegraph" = server scan via
HugeInputSplitFetcher, "loader" = HDFS file splits via
LoaderFileInputSplitFetcher / FileVertxFetcher). The Spark analogue has
the same two source families, but both land on a plain DataFrame so
everything downstream (derivation, algorithms, pipeline ops) never sees
the source kind:

- **catalog table** (``table:`` prefix, or any dotted name with no path
  separator) -> ``spark.read.table(name)``. This is the 10^12-turn
  production path: the table lives in an Iceberg/Hive/Unity catalog and
  the catalog owns format, partition layout, split planning, and
  snapshot isolation. Nothing in this repo assumes a specific catalog —
  ``spark.read.table`` is format-agnostic, so the same call reads an
  Iceberg table on a cluster with the Iceberg runtime on the classpath
  and a plain ``saveAsTable`` parquet table in the local test
  environment (which has no Iceberg jar; the pytest covers the catalog
  path with exactly that).
- **file path** -> format inferred from the extension of the path or of
  the files inside it (parquet default; csv read with an explicit
  schema + header; json with an explicit schema — never
  ``inferSchema``, which would double-scan 100 TB).

Every source is validated against the mandated transcript shape
(BASELINE.json input_hint): columns are selected by NAME (extra columns
pruned — projection pushdown keeps them unread under parquet/Iceberg)
and cast to the canonical types, so a string-typed csv ``turn_idx``
arrives as int32 downstream either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hugegraph_computer_spark.streaming.incremental import TRANSCRIPT_SCHEMA

_FILE_FORMATS = ("parquet", "csv", "json", "orc")


def _infer_file_format(path: str) -> str:
    base = path.rstrip("/")
    ext = os.path.splitext(base)[1].lstrip(".").lower()
    if ext in _FILE_FORMATS:
        return ext
    if os.path.isdir(base):
        # a directory of part files: look at the first data file
        for name in sorted(os.listdir(base)):
            e = os.path.splitext(name)[1].lstrip(".").lower()
            if e in _FILE_FORMATS:
                return e
    return "parquet"


def read_transcripts(
    spark: SparkSession,
    source: str,
    fmt: str | None = None,
) -> DataFrame:
    """Load the transcript table from a catalog table name or a file
    path and return it in the canonical shape
    (conv_id, turn_idx, role, text, tool, ts).

    ``fmt`` forces the source kind: "table" or one of parquet/csv/json/
    orc; default is inferred (``table:`` prefix or a dotted,
    separator-free name -> catalog; otherwise file path + extension).
    """
    if source.startswith("table:"):
        source, fmt = source[len("table:"):], "table"
    if fmt is None:
        looks_like_table = (
            "/" not in source
            and not os.path.exists(source)
            and os.path.splitext(source)[1].lstrip(".").lower()
            not in _FILE_FORMATS
        )
        fmt = "table" if looks_like_table else _infer_file_format(source)

    if fmt == "table":
        try:
            df = spark.read.table(source)
        except Exception as e:
            # inference falls through to the catalog for any name with
            # no '/', no recognized extension, and no local file — a
            # mistyped path lands here, so say how to disambiguate
            raise ValueError(
                f"transcript source {source!r} resolved as a catalog "
                "table and lookup failed; if it is a file path, pass "
                "fmt='parquet'/'csv'/'json'/'orc' (or give a path that "
                "exists); if it is a table, the 'table:' prefix makes "
                f"the intent explicit. Catalog error: {e}"
            ) from e
    elif fmt == "parquet":
        df = spark.read.parquet(source)
    elif fmt == "orc":
        df = spark.read.orc(source)
    elif fmt == "csv":
        df = spark.read.schema(TRANSCRIPT_SCHEMA).option("header", True).csv(
            source
        )
    elif fmt == "json":
        df = spark.read.schema(TRANSCRIPT_SCHEMA).json(source)
    else:
        raise ValueError(f"unknown transcript source format: {fmt!r}")

    missing = [f.name for f in TRANSCRIPT_SCHEMA.fields if f.name not in df.columns]
    if missing:
        raise ValueError(
            f"transcript source {source!r} is missing required columns "
            f"{missing}; have {df.columns}"
        )
    # name-select (prunes extras; pushdown-friendly) + canonical casts
    return df.select(
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            for f in TRANSCRIPT_SCHEMA.fields
        ]
    )
