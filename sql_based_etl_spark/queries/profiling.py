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


def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key diagnostic over events.user_id
    (operators/profiling.py:key_skew_stats): the 10 heaviest users with
    row share and skew factor — the measurement that picks between AQE
    skew handling, targeted salting (operators/joins.py), or nothing."""
    from sql_based_etl_spark.operators.profiling import key_skew_stats

    return key_skew_stats(load(spark, sf_dir, "events"), "user_id", top_n=10)


QUERIES["profile_key_skew"] = profile_key_skew

ORACLES["profile_key_skew"] = """
    WITH counts AS (
        SELECT user_id AS k, count(*) AS cnt FROM events GROUP BY user_id
    ),
    t AS (SELECT sum(cnt) AS total, count(*) AS nkeys FROM counts),
    top AS (SELECT k, cnt FROM counts ORDER BY cnt DESC, k ASC NULLS LAST LIMIT 10)
    SELECT CAST(k AS VARCHAR) AS key, cnt,
           ((cnt * 1000000) // total) / 1000000.0 AS share,
           ((cnt * 1000000 * nkeys) // total) / 1000000.0 AS skew_factor
    FROM top, t
"""


def sketch_kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based corpus overlap (operators/sketches.py:kmv_overlap):
    the word-set Jaccard between the even-doc_id half of the corpus and
    the odd half, estimated purely from two 256-long KMV sketches — the
    'how much does today's crawl overlap yesterday's' check that never
    rescans either side."""
    from pyspark.sql import functions as F

    from sql_based_etl_spark.operators.dedup import words_col
    from sql_based_etl_spark.operators.sketches import kmv_overlap, kmv_sketch

    docs = load(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(words_col("text")).alias("w"))
    a = kmv_sketch(words.filter(F.col("doc_id") % 2 == 0), "w")
    b = kmv_sketch(words.filter(F.col("doc_id") % 2 == 1), "w")
    return kmv_overlap(a, b)


QUERIES["sketch_kmv_source_overlap"] = sketch_kmv_source_overlap

_W_HALF = """
    SELECT DISTINCT CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) AS h
    FROM (
        SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                  x -> x <> '')) AS w
        FROM documents WHERE doc_id % 2 = {parity}
    )
"""

ORACLES["sketch_kmv_source_overlap"] = f"""
    WITH ska AS (SELECT h FROM ({_W_HALF.format(parity=0)}) ORDER BY h LIMIT 256),
    skb AS (SELECT h FROM ({_W_HALF.format(parity=1)}) ORDER BY h LIMIT 256),
    m AS (
        SELECT h FROM (SELECT h FROM ska UNION SELECT h FROM skb)
        ORDER BY h LIMIT 256
    ),
    flags AS (
        SELECT m.h,
               CASE WHEN a.h IS NOT NULL THEN 1 ELSE 0 END
               * CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END AS mt
        FROM m LEFT JOIN ska a ON m.h = a.h LEFT JOIN skb b ON m.h = b.h
    ),
    agg AS (
        SELECT count(*) AS n_kept, max(h) AS h_k,
               CAST(sum(mt) AS BIGINT) AS matches
        FROM flags
    )
    SELECT n_kept, matches,
           round(CASE WHEN n_kept < 256 THEN CAST(n_kept AS DOUBLE)
                      ELSE 255.0 * 1152921504606846976.0 / h_k END, 3) AS union_est,
           round(matches / n_kept, 6) AS jaccard_est,
           round(matches / n_kept *
                 round(CASE WHEN n_kept < 256 THEN CAST(n_kept AS DOUBLE)
                            ELSE 255.0 * 1152921504606846976.0 / h_k END, 3),
                 3) AS intersect_est
    FROM agg
"""


_HIST_QS = [0.25, 0.5, 0.9, 0.99]


def sketch_hist_event_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles of events.value from a 1000-bin mergeable histogram
    (operators/sketches.py:histogram_sketch/histogram_quantiles) —
    the distribution complement to KMV/CMS: values never shuffle, only
    counter rows, and per-shard histograms merge by addition."""
    from sql_based_etl_spark.operators.sketches import (
        histogram_quantiles,
        histogram_sketch,
    )

    hist = histogram_sketch(load(spark, sf_dir, "events"), "value", 0.0, 500.0, 1000)
    return histogram_quantiles(hist, _HIST_QS, 0.0, 500.0, 1000)


QUERIES["sketch_hist_event_quantiles"] = sketch_hist_event_quantiles

ORACLES["sketch_hist_event_quantiles"] = f"""
    WITH h AS (
        SELECT least(greatest(CAST(floor((CAST(value AS DOUBLE) - 0.0) / 500.0 * 1000.0)
                                   AS BIGINT), 0), 999) AS bin,
               count(*) AS cnt
        FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    c AS (
        SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cum,
               sum(cnt) OVER () AS total
        FROM h
    ),
    qs AS (SELECT unnest([{", ".join(f"CAST({q} AS DOUBLE)" for q in _HIST_QS)}]) AS q),
    j AS (
        SELECT q, bin,
               round(0.0 + (CAST(bin AS DOUBLE)
                            + (q * CAST(total AS DOUBLE)
                               - CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE))
                     * 0.5, 6) AS v
        FROM qs, c WHERE CAST(cum AS DOUBLE) >= q * CAST(total AS DOUBLE)
    )
    SELECT q, min_by(v, bin) AS value_est FROM j GROUP BY q
"""


def profile_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score anomaly report over events.value
    (operators/profiling.py:numeric_outlier_stats): integer-millis
    moments (bit-exact cross-engine), 6-decimal-rounded mean/std, and
    the |z| > 3 outlier count — the numeric complement to the
    categorical expectation gates."""
    from sql_based_etl_spark.operators.profiling import numeric_outlier_stats

    return numeric_outlier_stats(load(spark, sf_dir, "events"), "event_type", "value")


QUERIES["profile_value_outliers"] = profile_value_outliers

ORACLES["profile_value_outliers"] = """
    WITH q AS (
        SELECT event_type AS g,
               CAST(round(CAST(value AS DOUBLE) * 1000.0) AS BIGINT) AS xq
        FROM events WHERE value IS NOT NULL
    ),
    stats AS (
        SELECT g, count(*) AS n,
               CAST(sum(xq) AS BIGINT) AS s,
               CAST(sum(xq * xq) AS BIGINT) AS ss
        FROM q GROUP BY g
    ),
    enriched AS (
        SELECT g, n,
               round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1000.0, 6) AS mean,
               round(sqrt((CAST(ss AS DOUBLE)
                           - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                          / CAST(n AS DOUBLE) / 1000000.0), 6) AS std
        FROM stats
    ),
    flagged AS (
        SELECT q.g, count(*) AS n_outliers
        FROM q JOIN enriched e ON q.g = e.g
        WHERE abs(CAST(q.xq AS DOUBLE) / 1000.0 - e.mean) > 3.0 * e.std
        GROUP BY q.g
    )
    SELECT CAST(e.g AS VARCHAR) AS "group", e.n, e.mean, e.std,
           coalesce(f.n_outliers, 0) AS n_outliers
    FROM enriched e LEFT JOIN flagged f ON e.g = f.g
"""
