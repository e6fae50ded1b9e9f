"""Text-analysis operators over the documents table — all JVM-side
column expressions (split / lambda filters / md5), no Python UDFs.

These are the large-scale training-data-pipeline primitives: token
counting, quality scoring, language ID heuristics, and document
fingerprinting. Each is a single narrow projection over a parquet scan
(column pruning + pushdown apply), embarrassingly parallel at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["a", "the", "of", "and", "in", "to", "is"]


def _tokens():
    return F.split(F.col("text"), " ")


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens, n_chars_measured)."""
    t = _tokens()
    return docs.select(
        "doc_id",
        F.size(t).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_distinct_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality in [0,1]: length saturation + lexical diversity
    + stopword-rate band. Deterministic closed form, SQL-mirrorable."""
    t = _tokens()
    n = F.size(t).cast("double")
    distinct_ratio = F.size(F.array_distinct(t)) / n
    stop = F.size(
        F.filter(t, lambda x: x.isin(*STOPWORDS))
    ).cast("double")
    stop_ratio = stop / n
    score = (
        0.4 * F.least(n / 50.0, F.lit(1.0))
        + 0.3 * distinct_ratio
        + 0.3 * (1.0 - stop_ratio)
    )
    return docs.select(
        "doc_id",
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """N-gram/stopword language heuristic: flag 'en' when the English
    stopword rate clears 5%, else 'unk' (the container has no langid
    model; the Spark-side shape — projection over a token filter — is
    what carries to a real model via pandas_udf)."""
    t = _tokens()
    stop_ratio = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS))) / F.size(t).cast(
        "double"
    )
    return docs.select(
        "doc_id",
        F.when(stop_ratio > 0.05, F.lit("en")).otherwise(F.lit("unk")).alias(
            "predicted_lang"
        ),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Deterministic document fingerprint: min token-md5 (a 1-perm
    MinHash) + content md5. Pure built-ins, portable to any engine."""
    t = _tokens()
    return docs.select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        F.array_min(F.transform(t, lambda x: F.md5(x))).alias("min_token_md5"),
    )
