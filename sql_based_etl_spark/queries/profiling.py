"""Table-profiling query: per-column stats over ``orders`` in one pass."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sql_based_etl_spark.operators.profiling import profile
from sql_based_etl_spark.queries._util import load

_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"]


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile(load(spark, sf_dir, "orders"), columns=_COLS)


QUERIES = {"profile_orders": profile_orders}


def _col_block(c: str) -> str:
    return f"""
        SELECT '{c}' AS "column", count(*) AS n_rows,
               CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               count(DISTINCT {c}) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_value,
               CAST(max({c}) AS VARCHAR) AS max_value
        FROM orders
    """


ORACLES = {
    "profile_orders": " UNION ALL ".join(_col_block(c) for c in _COLS),
}


def sketch_kmv_event_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch estimate over event_id
    (operators/sketches.py): one deterministic row
    (n_kept, h_k, distinct_est)."""
    from sql_based_etl_spark.operators.sketches import kmv_estimate, kmv_sketch
    from sql_based_etl_spark.queries._util import load

    return kmv_estimate(kmv_sketch(load(spark, sf_dir, "events"), "event_id"))


QUERIES["sketch_kmv_event_ids"] = sketch_kmv_event_ids

ORACLES["sketch_kmv_event_ids"] = """
    WITH hs AS (
        SELECT DISTINCT CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM events
    ),
    sk AS (SELECT h FROM hs ORDER BY h LIMIT 256)
    SELECT CAST(count(*) AS BIGINT) AS n_kept,
           max(h) AS h_k,
           round(CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
                      ELSE 255.0 * 1152921504606846976.0 / max(h) END, 3) AS distinct_est
    FROM sk
"""


def sketch_cms_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates for the corpus's exact
    top-20 words (operators/sketches.py:cms_sketch/cms_estimate):
    the mergeable frequency complement to the KMV cardinality sketch,
    reproduced counter-for-counter by the oracle."""
    from pyspark.sql import functions as F

    from sql_based_etl_spark.operators.dedup import words_col
    from sql_based_etl_spark.operators.sketches import cms_estimate, cms_sketch

    docs = load(spark, sf_dir, "documents")
    words = docs.select(F.explode(words_col("text")).alias("w"))
    sk = cms_sketch(words, "w")
    top = (
        words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w").asc()).limit(20).select("w")
    )
    return cms_estimate(sk, top, "w").select(
        F.col("key").alias("word"), F.col("freq_est").cast("long").alias("freq_est")
    )


QUERIES["sketch_cms_word_freq"] = sketch_cms_word_freq

_CMS_H = ("CAST(concat('0x', substr(md5(concat(w, '|cms', CAST(d AS VARCHAR))), 1, 15)) "
          "AS BIGINT) % 2048")

ORACLES["sketch_cms_word_freq"] = f"""
    WITH w AS (
        SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                  x -> x <> '')) AS w
        FROM documents
    ),
    ds AS (SELECT unnest([0, 1, 2, 3]) AS d),
    counters AS (
        SELECT d, {_CMS_H} AS bucket, count(*) AS cnt
        FROM w, ds GROUP BY 1, 2
    ),
    topw AS (
        SELECT w FROM w GROUP BY w ORDER BY count(*) DESC, w ASC LIMIT 20
    ),
    probes AS (SELECT w, d, {_CMS_H} AS bucket FROM topw, ds)
    SELECT w AS word, min(coalesce(cnt, 0)) AS freq_est
    FROM probes LEFT JOIN counters USING (d, bucket)
    GROUP BY w
"""
