"""Text-analysis operators as oracle-checked queries over ``documents``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_based_etl_spark.operators.textops import (
    PII_PATTERNS,
    STOPWORDS,
    TOKEN_REGEX,
    fingerprint,
    language_id,
    pii_scrub,
    quality_features,
    quality_filter,
    rolling_fingerprint,
    token_counts,
)
from sql_based_etl_spark.queries._util import load


def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = language_id(load(spark, sf_dir, "documents"))
    return out.select("doc_id", "lang", "pred_lang")


def text_language_id_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate accuracy of the heuristic vs the labeled lang column."""
    out = language_id(load(spark, sf_dir, "documents"))
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("pred_lang") == F.col("lang"), 1).otherwise(0)).alias("n_correct"),
    )


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # wide=True: one pure-projection pass of per-doc regex features —
    # the whole query is scan-stage compute (−52% in the r13 A/B)
    return quality_features(load(spark, sf_dir, "documents", wide=True))


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_counts(load(spark, sf_dir, "documents"))


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint + collapse: docs sharing a fingerprint form a cluster."""
    fp = fingerprint(load(spark, sf_dir, "documents"))
    return fp.groupBy("fingerprint").agg(
        F.min("doc_id").alias("representative"), F.count(F.lit(1)).alias("cluster_size")
    )


def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rolling_fingerprint(load(spark, sf_dir, "documents"))


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the corpus. The synthetic documents contain
    no PII, so a third of them get a deterministic injection (email +
    URL + long digit run derived from doc_id) before the scrub — the
    oracle mirrors the injection, so both engines redact real work."""
    d = load(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    injected = F.concat(
        F.col("text"),
        F.lit(" contact user"), sid, F.lit("@example.com or https://ex.io/d/"),
        sid, F.lit(" ref "), (F.col("doc_id") * 1234567 + 10000000).cast("string"),
    )
    body = F.when(F.col("doc_id") % 3 == 0, injected).otherwise(F.col("text"))
    return pii_scrub(d.withColumn("text", body))


def docs_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite pretraining gate (language + length + quality +
    variant-dedup) over the documents corpus."""
    return quality_filter(load(spark, sf_dir, "documents"))


QUERIES = {
    "text_language_id": text_language_id,
    "text_language_id_accuracy": text_language_id_accuracy,
    "text_quality_score": text_quality_score,
    "text_token_count": text_token_count,
    "text_fingerprint": text_fingerprint,
    "text_rolling_fingerprint": text_rolling_fingerprint,
    "text_pii_scrub": text_pii_scrub,
    "docs_quality_filter": docs_quality_filter,
}

# --- oracle SQL -------------------------------------------------------------

_WORDS = "list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '')"


def _sw_lit(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


def _hits(lang: str) -> str:
    return f"len(list_filter(words, w -> list_contains({_sw_lit(lang)}, w)))"


_LANG_PRED = f"""
    CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
         WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
         WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
         WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
         ELSE 'es' END
"""

_LANG_SCORED = f"""
    SELECT doc_id, lang, {_LANG_PRED} AS pred_lang FROM (
        SELECT doc_id, lang,
               {_hits('en')} AS s_en, {_hits('de')} AS s_de,
               {_hits('fr')} AS s_fr, {_hits('es')} AS s_es
        FROM (SELECT doc_id, lang, {_WORDS} AS words FROM documents)
    )
"""

_ALL_SW = "[" + ", ".join(f"'{w}'" for w in sorted({w for ws in STOPWORDS.values() for w in ws})) + "]"

ORACLES = {
    "text_language_id": _LANG_SCORED,
    "text_language_id_accuracy": f"""
        SELECT lang, count(*) AS n,
               CAST(sum(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        FROM ({_LANG_SCORED}) GROUP BY lang
    """,
    "text_quality_score": f"""
        SELECT doc_id,
               n_chars, n_words, mean_word_len, punct_ratio, stopword_ratio,
               round(least(n_words / 100.0, 1.0) * 0.4
                     + (1.0 - punct_ratio) * 0.3 + stopword_ratio * 0.3, 6) AS quality_score
        FROM (
            SELECT doc_id,
                   CAST(length(text) AS INTEGER) AS n_chars,
                   CAST(len(words) AS INTEGER) AS n_words,
                   round(list_aggregate(list_transform(words, w -> CAST(length(w) AS BIGINT)), 'sum')
                         / greatest(len(words), 1), 6) AS mean_word_len,
                   round(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
                         / greatest(length(text), 1), 6) AS punct_ratio,
                   round(len(list_filter(words, w -> list_contains({_ALL_SW}, w)))
                         / greatest(len(words), 1), 6) AS stopword_ratio
            FROM (SELECT doc_id, text, {_WORDS} AS words FROM documents)
        )
    """,
    "text_token_count": f"""
        SELECT doc_id,
               CAST(len({_WORDS}) AS INTEGER) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS INTEGER) AS regex_tokens
        FROM documents
    """,
    "text_fingerprint": f"""
        SELECT md5(array_to_string(list_sort(list_distinct({_WORDS})), ' ')) AS fingerprint,
               min(doc_id) AS representative, count(*) AS cluster_size
        FROM documents GROUP BY 1
    """,
    # scrub order mirrors PII_PATTERNS: counts taken on the
    # progressively-cleaned text, DuckDB regexp_replace needs the 'g' flag
    "text_pii_scrub": f"""
        WITH body AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0
                        THEN concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                                    '@example.com or https://ex.io/d/', CAST(doc_id AS VARCHAR),
                                    ' ref ', CAST(doc_id * 1234567 + 10000000 AS VARCHAR))
                        ELSE text END AS t
            FROM documents
        ),
        s1 AS (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(t, '{PII_PATTERNS[0][1]}')) AS INTEGER) AS n_urls,
                   regexp_replace(t, '{PII_PATTERNS[0][1]}', '{PII_PATTERNS[0][2]}', 'g') AS t
            FROM body
        ),
        s2 AS (
            SELECT doc_id, n_urls,
                   CAST(len(regexp_extract_all(t, '{PII_PATTERNS[1][1]}')) AS INTEGER) AS n_emails,
                   regexp_replace(t, '{PII_PATTERNS[1][1]}', '{PII_PATTERNS[1][2]}', 'g') AS t
            FROM s1
        )
        SELECT doc_id, n_urls, n_emails,
               CAST(len(regexp_extract_all(t, '{PII_PATTERNS[2][1]}')) AS INTEGER) AS n_digit_runs,
               regexp_replace(t, '{PII_PATTERNS[2][1]}', '{PII_PATTERNS[2][2]}', 'g') AS clean_text
        FROM s2
    """,
    "docs_quality_filter": f"""
        WITH scored AS ({_LANG_SCORED}),
        q AS (
            SELECT doc_id,
                   CAST(len(words) AS INTEGER) AS n_words,
                   round(least(len(words) / 100.0, 1.0) * 0.4
                         + (1.0 - round(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
                                        / greatest(length(text), 1), 6)) * 0.3
                         + round(len(list_filter(words, w -> list_contains({_ALL_SW}, w)))
                                 / greatest(len(words), 1), 6) * 0.3, 6) AS quality_score
            FROM (SELECT doc_id, text, {_WORDS} AS words FROM documents)
        ),
        fp AS (
            SELECT doc_id,
                   md5(array_to_string(list_sort(list_distinct({_WORDS})), ' ')) AS f
            FROM documents
        ),
        rep AS (
            SELECT doc_id FROM (
                SELECT doc_id, min(doc_id) OVER (PARTITION BY f) AS r FROM fp
            ) WHERE doc_id = r
        )
        SELECT s.doc_id, s.pred_lang, q.n_words, q.quality_score
        FROM scored s
        JOIN q ON q.doc_id = s.doc_id
        JOIN rep ON rep.doc_id = s.doc_id
        WHERE s.pred_lang <> 'und' AND q.n_words >= 30 AND q.quality_score >= 0.45
    """,
    "text_rolling_fingerprint": f"""
        WITH toks AS (
            SELECT doc_id, {_WORDS} AS words FROM documents
        ),
        ex0 AS (
            SELECT doc_id, words,
                   unnest(generate_series(1, len(words))) AS i
            FROM toks
        ),
        ex AS (
            SELECT doc_id,
                   CAST((i - 1) % 48 AS BIGINT) AS r,
                   CAST(concat('0x', substr(md5(words[i]), 1, 12)) AS BIGINT) AS h
            FROM ex0
        )
        SELECT doc_id,
               bit_xor((h % (CAST(1 AS BIGINT) << CAST(48 - r AS INTEGER)))
                           * (CAST(1 AS BIGINT) << CAST(r AS INTEGER))
                       + (h // (CAST(1 AS BIGINT) << CAST(48 - r AS INTEGER)))) AS rolling_fp
        FROM ex
        GROUP BY doc_id
    """,
}


def text_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level trigram document frequency, top 20 (ties broken by
    the shingle text so the cut is deterministic across engines)."""
    from sql_based_etl_spark.operators.dedup import shingle_rows

    inv = shingle_rows(load(spark, sf_dir, "documents"), "doc_id", "text", 3,
                       distinct=True)
    return (
        inv.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("s"))
        .limit(20)
        .select(F.col("s").alias("ngram"), "df")
    )


QUERIES["text_top_ngrams"] = text_top_ngrams

ORACLES["text_top_ngrams"] = """
    WITH docs AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(words) - 2, 1)),
                   i -> array_to_string(list_slice(words, i, i + 2), ' ')
               )) AS sh
        FROM (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '') AS words
            FROM documents
        )
    )
    SELECT s AS ngram, count(*) AS df
    FROM (SELECT id, unnest(sh) AS s FROM (SELECT doc_id AS id, sh FROM docs))
    GROUP BY s
    ORDER BY df DESC, s ASC
    LIMIT 20
"""


def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs (doc_id % 20 != 0)
    sharing any distinct 8-gram with a held-out 'benchmark' slice
    (doc_id % 20 == 0) — the eval-leakage guard of a pretraining
    pipeline. Inverted-index broadcast join; see
    operators/textops.py:decontaminate."""
    from sql_based_etl_spark.operators.textops import decontaminate

    docs = load(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    return decontaminate(corpus, bench, n=8, min_shared=1)


QUERIES["text_decontaminate"] = text_decontaminate

ORACLES["text_decontaminate"] = """
    WITH sh AS (
        SELECT doc_id AS id,
               unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(words) - 7, 1)),
                   i -> CAST(concat('0x', substr(md5(array_to_string(list_slice(words, i, i + 7), ' ')), 1, 15)) AS BIGINT)
               ))) AS h
        FROM (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '') AS words
            FROM documents
        )
    ),
    corpus0 AS (SELECT id, h FROM sh WHERE id % 20 <> 0),
    hot AS (SELECT h FROM corpus0 GROUP BY h HAVING count(*) > 1000),
    corpus AS (SELECT id, h FROM corpus0 WHERE h NOT IN (SELECT h FROM hot)),
    bench AS (SELECT id AS bench_id, h FROM sh WHERE id % 20 = 0)
    SELECT id AS doc_id, bench_id, count(*) AS shared_ngrams
    FROM corpus JOIN bench USING (h)
    GROUP BY id, bench_id HAVING count(*) >= 1
"""


def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document (see
    operators/textops.py:repetition_stats)."""
    from sql_based_etl_spark.operators.textops import repetition_stats

    return repetition_stats(load(spark, sf_dir, "documents"))


QUERIES["text_repetition_stats"] = text_repetition_stats

# Mirrors the Spark pipeline exactly: same tokenization, the same
# short-doc fallback (full text as the single n-gram), and the same
# 28-bit md5 hash of each n-gram, so counts match even under collision.
ORACLES["text_repetition_stats"] = """
    WITH words AS (
        SELECT doc_id AS id,
               list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                           w -> w <> '') AS words
        FROM documents
    ),
    grams AS (
        SELECT id, 1 AS g, unnest(words) AS s FROM words
        UNION ALL
        SELECT id, 2 AS g,
               unnest(list_transform(
                   generate_series(1, greatest(len(words) - 1, 1)),
                   i -> array_to_string(list_slice(words, i, i + 1), ' '))) AS s
        FROM words
        UNION ALL
        SELECT id, 3 AS g,
               unnest(list_transform(
                   generate_series(1, greatest(len(words) - 2, 1)),
                   i -> array_to_string(list_slice(words, i, i + 2), ' '))) AS s
        FROM words
    ),
    per_gram AS (
        SELECT id, g, CAST(concat('0x', substr(md5(s), 1, 7)) AS BIGINT) AS h,
               count(*) AS n
        FROM grams GROUP BY 1, 2, 3
    ),
    per_size AS (
        SELECT id, g, sum(n) AS tot, count(*) AS dst, max(n) AS mx
        FROM per_gram GROUP BY 1, 2
    )
    SELECT id AS doc_id,
           CAST(max(CASE WHEN g = 1 THEN tot END) AS BIGINT) AS n_words,
           round(max(CASE WHEN g = 1 THEN mx END)
                 / max(CASE WHEN g = 1 THEN tot END), 6) AS top_word_frac,
           round((max(CASE WHEN g = 2 THEN tot END) - max(CASE WHEN g = 2 THEN dst END))
                 / max(CASE WHEN g = 2 THEN tot END), 6) AS dup_2gram_frac,
           round((max(CASE WHEN g = 3 THEN tot END) - max(CASE WHEN g = 3 THEN dst END))
                 / max(CASE WHEN g = 3 THEN tot END), 6) AS dup_3gram_frac
    FROM per_size GROUP BY id
"""


def text_chunk_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk every document into 32-word windows (4-word overlap) and
    pack the chunks into ~256-word training bins
    (operators/textops.py:chunk_documents/pack_chunks)."""
    from sql_based_etl_spark.operators.textops import chunk_documents, pack_chunks

    chunks = chunk_documents(
        load(spark, sf_dir, "documents"), max_words=32, overlap=4
    )
    return pack_chunks(chunks, budget=256).select(
        F.col("id").alias("doc_id"), "chunk_idx", "n_words", "chunk_text", "bin_id"
    )


QUERIES["text_chunk_pack"] = text_chunk_pack

# Same tokenization, same 1-based slice bounds (Spark slice(start,len) ==
# DuckDB list_slice(start, start+len-1)), same cumulative-sum bin rule.
ORACLES["text_chunk_pack"] = """
    WITH words AS (
        SELECT doc_id AS id,
               list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                           w -> w <> '') AS words
        FROM documents
    ),
    sized AS (
        SELECT id, words,
               1 + CAST(ceil(greatest(len(words) - 32, 0) / 28.0) AS INTEGER) AS nc
        FROM words WHERE len(words) > 0
    ),
    idx AS (
        SELECT id, words, unnest(generate_series(0, nc - 1)) AS chunk_idx
        FROM sized
    ),
    chunks AS (
        SELECT id, chunk_idx,
               list_slice(words, chunk_idx * 28 + 1, chunk_idx * 28 + 32) AS piece
        FROM idx
    )
    SELECT id AS doc_id, chunk_idx,
           CAST(len(piece) AS INTEGER) AS n_words,
           array_to_string(piece, ' ') AS chunk_text,
           CAST(floor((sum(len(piece)) OVER (ORDER BY id, chunk_idx) - len(piece))
                      / 256.0) AS BIGINT) AS bin_id
    FROM chunks
"""


def docs_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distilled linear quality classifier applied to the quality
    features through the ModelScoreTransform stage (weights as
    literals -> one codegen projection)."""
    from sql_based_etl_spark.engine.pipeline import Pipeline
    from sql_based_etl_spark.operators.textops import quality_features

    quality_features(load(spark, sf_dir, "documents")).createOrReplaceTempView(
        "model_score_feats"
    )
    ctx = Pipeline(spark).run([{
        "type": "ModelScoreTransform", "inputView": "model_score_feats",
        "outputView": "model_scored",
        "model": {
            "intercept": -1.0,
            "weights": {"n_words": 0.01, "mean_word_len": 0.2,
                        "punct_ratio": -2.0, "stopword_ratio": 1.5},
            "threshold": 0.0,
            "decimals": {"weights": 2, "features": 6},
        },
    }])
    return ctx.views["model_scored"].select("doc_id", "score", "label")


QUERIES["docs_model_score"] = docs_model_score

# The features are the (already 6-rounded, engine-exact) quality
# columns; the linear term reproduces the stage's left-to-right fold.
ORACLES["docs_model_score"] = """
    WITH feats AS ({quality_oracle}),
    scaled AS (
        SELECT doc_id,
               -100000000
               + 1 * CAST(round(n_words * 1000000.0) AS BIGINT)
               + 20 * CAST(round(mean_word_len * 1000000.0) AS BIGINT)
               + -200 * CAST(round(punct_ratio * 1000000.0) AS BIGINT)
               + 150 * CAST(round(stopword_ratio * 1000000.0) AS BIGINT) AS z
        FROM feats
    )
    SELECT doc_id,
           CAST(z AS DOUBLE) / 100000000.0 AS score,
           CAST(z >= 0 AS INT) AS label
    FROM scaled
""".format(quality_oracle=ORACLES["text_quality_score"])


def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 tf-idf keywords per document
    (operators/textops.py:tfidf_topk): tf · ln(N/df), desc-score /
    asc-word top-k window. Both engines compute the identical double
    expression, so rounded scores (and therefore ranks) match."""
    from sql_based_etl_spark.operators.textops import tfidf_topk

    return tfidf_topk(load(spark, sf_dir, "documents"), k=3)


QUERIES["text_tfidf_topk"] = text_tfidf_topk

ORACLES["text_tfidf_topk"] = """
    WITH w AS (
        SELECT doc_id AS id,
               unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                  x -> x <> '')) AS word
        FROM documents
    ),
    tf AS (SELECT id, word, count(*) AS tf FROM w GROUP BY id, word),
    dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
        SELECT tf.id, tf.word, tf.tf, dfreq.df,
               round(tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df), 6) AS score
        FROM tf JOIN dfreq USING (word) CROSS JOIN n
    ),
    ranked AS (
        SELECT id, word, tf, df, score,
               row_number() OVER (PARTITION BY id
                                  ORDER BY score DESC, word ASC) AS rank
        FROM scored
    )
    SELECT id AS doc_id, word, tf, df, score, rank
    FROM ranked WHERE rank <= 3
"""


def text_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination pre-filter
    (operators/textops.py:bloom_decontaminate): the benchmark slice
    (doc_id % 20 == 0) is compacted into a 16 KiB bitmap driver-side,
    and the training slice is scanned with zero joins — each raw
    8-gram probes 3 double-hashed bit positions from one md5 in
    codegen, and only survivors are deduplicated per doc. The oracle
    reproduces the identical position set (including any false
    positives) via set-membership SQL, which is bitwise-equivalent to
    the bitmap."""
    from sql_based_etl_spark.operators.textops import bloom_build, bloom_decontaminate

    # wide=True: the probe side runs every 8-gram through md5 + 3 bit
    # probes straight off the scan (−22% in the r13 interleaved A/B)
    docs = load(spark, sf_dir, "documents", wide=True)
    bloom = bloom_build(docs.filter(F.col("doc_id") % 20 == 0), n=8)
    return bloom_decontaminate(docs.filter(F.col("doc_id") % 20 != 0), bloom, n=8)


QUERIES["text_bloom_decontaminate"] = text_bloom_decontaminate

# double hashing (Kirsch–Mitzenmacher): pos_j = (h1 + j·h2) % m with
# h1/h2 = hex slices [1,8] and [9,16] of ONE md5 — mirrors
# operators/textops.py:_bloom_positions bit-for-bit
_BLOOM_POS = (
    "(CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT)"
    " + j * CAST(concat('0x', substr(md5(s), 9, 8)) AS BIGINT)) % 131072"
)

ORACLES["text_bloom_decontaminate"] = f"""
    WITH sh AS (
        SELECT doc_id AS id,
               unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(words) - 7, 1)),
                   i -> array_to_string(list_slice(words, i, i + 7), ' ')
               ))) AS s
        FROM (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '') AS words
            FROM documents
        )
    ),
    js AS (SELECT unnest(generate_series(0, 2)) AS j),
    positions AS (
        SELECT DISTINCT {_BLOOM_POS} AS pos
        FROM (SELECT DISTINCT s FROM sh WHERE id % 20 = 0), js
    ),
    cand AS (
        SELECT id, s, j, {_BLOOM_POS} AS pos
        FROM sh, js WHERE id % 20 <> 0
    ),
    member AS (
        SELECT id, s FROM cand JOIN positions USING (pos)
        GROUP BY id, s HAVING count(DISTINCT j) = 3
    )
    SELECT id AS doc_id, count(*) AS flagged_ngrams
    FROM member GROUP BY id HAVING count(*) >= 1
"""


def text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring
    (operators/textops.py:ngram_lm_perplexity): an add-one bigram LM is
    trained on the doc_id % 10 == 0 reference slice and every other
    document is scored by integer-micros average bigram NLL — the
    perplexity filter of the CCNet pipeline, training-free and
    oracle-replayable down to the micro."""
    from sql_based_etl_spark.operators.textops import ngram_lm_perplexity

    docs = load(spark, sf_dir, "documents")
    return ngram_lm_perplexity(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0),
    )


QUERIES["text_lm_perplexity"] = text_lm_perplexity

_BIGRAMS = """
    SELECT doc_id AS id,
           unnest(list_transform(
               generate_series(1, len(words) - 1),
               i -> array_to_string(list_slice(words, i, i + 1), ' ')
           )) AS s
    FROM (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '') AS words
        FROM documents
    )
    WHERE len(words) >= 2
"""

ORACLES["text_lm_perplexity"] = f"""
    WITH bi AS ({_BIGRAMS}),
    refbi AS (SELECT s FROM bi WHERE id % 10 = 0),
    c12 AS (SELECT s, count(*) AS c12 FROM refbi GROUP BY s),
    c1 AS (SELECT split_part(s, ' ', 1) AS w1, count(*) AS c1
           FROM refbi GROUP BY 1),
    v AS (SELECT count(DISTINCT split_part(s, ' ', 2)) AS v FROM refbi),
    scored AS (
        SELECT bi.id,
               CAST(round(ln((coalesce(c12.c12, 0) + 1.0)
                             / (coalesce(c1.c1, 0) + v.v)) * 1000000)
                    AS BIGINT) AS lp
        FROM bi
        LEFT JOIN c12 USING (s)
        LEFT JOIN c1 ON split_part(bi.s, ' ', 1) = c1.w1
        CROSS JOIN v
        WHERE bi.id % 10 <> 0
    )
    SELECT id AS doc_id, count(*) AS n_bigrams,
           CAST((-sum(lp)) // count(*) AS BIGINT) AS nll_micros
    FROM scored GROUP BY id
"""
