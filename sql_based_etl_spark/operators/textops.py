"""Text-analysis operators: language ID, quality scoring, token
counting, document fingerprinting. Pure built-in expressions — these
run per-row inside whole-stage codegen with no shuffle at all, the
cheapest possible shape at 100 TB (they pipeline straight out of the
parquet scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sql_based_etl_spark.operators.dedup import words_col

# Minimal function-word sets for the n-gram/stopword-voting heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "du", "que"],
    "es": ["el", "los", "las", "y", "es", "un", "una", "de", "del", "que"],
}
_LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic tie precedence

# BPE-ish tokenization: alnum runs OR single non-alnum-non-space marks
TOKEN_REGEX = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def _norm_col(text: str | Column) -> Column:
    """Lowercased, whitespace-normalized (single spaces, trimmed) text —
    the string the word tokens are cut from."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def _stopword_count(norm: Column, stopwords: list[str]) -> Column:
    """Whole-token stopword occurrences counted with one regex pass.

    regexp_count over the normalized text instead of a lambda filter on
    the token array: higher-order functions are CodegenFallback and
    drop the whole stage to interpreted evaluation (~100× slower on the
    documents scan). The trailing boundary is a lookahead so adjacent
    stopwords ("of the") both count."""
    alt = "|".join(stopwords)
    return F.regexp_count(norm, F.lit(f"(^| )({alt})(?= |$)"))


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-voting language ID: argmax of function-word hits, ties
    broken by fixed language precedence, no hits → 'und' (undetermined).
    """
    scored = df.withColumn("__norm", _norm_col(text_col))
    for lang in _LANG_ORDER:
        scored = scored.withColumn(
            f"__s_{lang}", _stopword_count(F.col("__norm"), STOPWORDS[lang])
        )
    best = F.greatest(*[F.col(f"__s_{lang}") for lang in _LANG_ORDER])
    pred = F.when(best == 0, F.lit("und"))
    for lang in _LANG_ORDER:  # first max in precedence order wins
        pred = pred.when(F.col(f"__s_{lang}") == best, F.lit(lang))
    return scored.withColumn("pred_lang", pred).drop(
        "__norm", *[f"__s_{lang}" for lang in _LANG_ORDER]
    )


def quality_cols(text_col: str = "text") -> dict[str, Column]:
    """Quality feature columns + composite score: length, word count,
    mean word length, punctuation ratio, stopword ratio.

    Every feature is a plain string expression (length/regexp_replace/
    regexp_count) — no token arrays, no lambdas — so the whole operator
    is one codegen'd projection pipelined off the scan."""
    norm = _norm_col(text_col)
    n_chars = F.length(text_col)
    n_words = F.size(F.split(norm, " "))
    # sum of token lengths == count of non-whitespace chars
    sum_wlen = F.length(F.regexp_replace(text_col, r"\s", "")).cast("bigint")
    mean_wlen = F.round(sum_wlen / F.greatest(n_words, F.lit(1)), 6)
    n_punct = F.length(F.regexp_replace(text_col, r"[A-Za-z0-9\s]", ""))
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    sw_all = sorted({w for ws in STOPWORDS.values() for w in ws})
    n_stop = _stopword_count(norm, sw_all)
    stop_ratio = F.round(n_stop / F.greatest(n_words, F.lit(1)), 6)
    score = F.round(
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - punct_ratio) * 0.3
        + stop_ratio * 0.3,
        6,
    )
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": mean_wlen,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "quality_score": score,
    }


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    qc = quality_cols(text_col)
    return df.select("doc_id", *[c.alias(n) for n, c in qc.items()])


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    ws = F.size(words_col(text_col))
    # Spark SQL string literals process backslash escapes ('\s' → 's'),
    # so the regex needs double-escaping here (DuckDB does not).
    spark_regex = TOKEN_REGEX.replace("\\", "\\\\")
    bpe = F.size(F.expr(f"regexp_extract_all({text_col}, '{spark_regex}', 0)"))
    return df.select("doc_id", ws.alias("ws_tokens"), bpe.alias("regex_tokens"))


def fingerprint_col(text_col: str = "text") -> Column:
    """Key-collapsing fingerprint: sorted distinct lowercase tokens,
    md5-hashed — the classic normalization for clustering variant
    duplicates (whitespace/order/case-insensitive)."""
    # sort_array, not array_sort: the latter is a higher-order function
    # (lambda comparator) and falls out of codegen
    return F.md5(F.concat_ws(" ", F.sort_array(F.array_distinct(words_col(text_col)))))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.select("doc_id", fingerprint_col(text_col).alias("fingerprint"))


def rolling_fingerprint(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Position-sensitive rolling fingerprint: each token's 48-bit hash
    is bit-rotated by its position (mod 48) and the rotations are
    XOR-folded per document — token order matters ("a b" ≠ "b a"),
    unlike the sorted-set :func:`fingerprint`.

    Scalable shape: posexplode → pure integer projection → one
    ``bit_xor`` aggregate (XOR is commutative/associative, so the
    combine is map-side partial and order-independent). The rotation
    uses exact int64 modular arithmetic — ``(h % 2^(48-r)) * 2^r +
    h div 2^(48-r)`` — which any engine reproduces bit-for-bit."""
    from sql_based_etl_spark.operators.dedup import portable_hash

    ex = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(words_col(text_col)).alias("pos", "w"),
    ).select(
        "doc_id",
        (F.col("pos") % 48).alias("r"),
        portable_hash(F.col("w"), hex_chars=12).alias("h"),
    )
    rot = F.expr(
        "(h % shiftleft(CAST(1 AS BIGINT), CAST(48 - r AS INT)))"
        " * shiftleft(CAST(1 AS BIGINT), CAST(r AS INT))"
        " + (h div shiftleft(CAST(1 AS BIGINT), CAST(48 - r AS INT)))"
    )
    return (
        ex.select("doc_id", rot.alias("rot"))
        .groupBy("doc_id")
        .agg(F.expr("bit_xor(rot)").alias("rolling_fp"))
    )


# PII redaction patterns — a regex subset on which Java regex (Spark)
# and RE2 (DuckDB) agree token-for-token, so the oracle can reproduce
# the scrub byte-identically. Order matters: URLs first (they often
# contain digit runs and @-signs), then emails, then long digit runs.
PII_PATTERNS = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("digits", r"[0-9]{7,}", "<NUM>"),
]


def pii_scrub(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Training-data PII scrub: redact URLs, email addresses, and long
    digit runs (phone/account-number shaped), reporting per-document
    redaction counts.

    Pure regexp_count/regexp_replace projection — codegen'd, zero
    shuffle, pipelines straight off the scan like the other text ops.
    Counts are taken *in scrub order* on the progressively-cleaned
    text, so a URL containing digits counts once as a URL and never as
    a digit run (the redaction literally removes it first)."""
    cur: Column = F.col(text_col)
    counts = {}
    for name, pattern, repl in PII_PATTERNS:
        counts[name] = F.regexp_count(cur, F.lit(pattern))
        cur = F.regexp_replace(cur, pattern, repl)
    return df.select(
        id_col,
        counts["url"].alias("n_urls"),
        counts["email"].alias("n_emails"),
        counts["digits"].alias("n_digit_runs"),
        cur.alias("clean_text"),
    )


def quality_filter(df: DataFrame, min_words: int = 30, min_score: float = 0.45,
                   text_col: str = "text") -> DataFrame:
    """Composite pretraining-data gate — the filter chain a training
    corpus actually runs: identified language + length floor + quality
    score floor + variant-duplicate removal (keep the lowest doc_id per
    key-collapsing fingerprint).

    One scan carries every per-row feature (language votes, quality
    score, fingerprint are all codegen'd projections); the only shuffle
    is the fingerprint window that picks cluster representatives."""
    from pyspark.sql import Window

    qc = quality_cols(text_col)
    scored = language_id(df, text_col).select(
        "doc_id",
        "pred_lang",
        qc["n_words"].alias("n_words"),
        qc["quality_score"].alias("quality_score"),
        fingerprint_col(text_col).alias("__fp"),
    )
    rep = F.min("doc_id").over(Window.partitionBy("__fp"))
    return (
        scored.withColumn("__rep", rep)
        .filter(
            (F.col("doc_id") == F.col("__rep"))
            & (F.col("pred_lang") != "und")
            & (F.col("n_words") >= min_words)
            & (F.col("quality_score") >= min_score)
        )
        .select("doc_id", "pred_lang", "n_words", "quality_score")
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_shared: int = 1,
    max_df: int | None = 1000,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing at
    least ``min_shared`` distinct word ``n``-grams with any benchmark
    document — the standard guard against eval-set leakage into
    pretraining data (long n-grams, default 8, so incidental phrase
    overlap doesn't flag).

    Shape at 100 TB: an inverted-index join keyed on 60-bit shingle
    identities — the benchmark side is tiny (eval sets are thousands
    of docs, not billions), so its index broadcasts and the corpus
    side never shuffles: explode → broadcast-hash join → per-(doc,
    bench) count. ``max_df`` drops corpus-side boilerplate shingles
    (license headers ...) that would otherwise flag everything;
    benchmark shingles are assumed curated.

    60-bit keys, NOT the 28-bit identities the pairwise-dedup
    pipelines use (operators/dedup.py:hashed_shingle_rows): a
    membership join has no downstream verify step, so ANY
    corpus-gram/bench-gram collision becomes a spurious flag — odds
    |corpus|·|bench|/2^bits, which at 28 bits is ~0.4 already at
    sf0.01 (one observed collision) and certain at corpus scale. At
    60 bits a 10¹³-gram corpus against a 10⁶-gram benchmark expects
    single-digit spurious flags.

    Returns ``(doc_id, bench_id, shared_ngrams)`` per contaminated
    (doc, benchmark-doc) pair.
    """
    from sql_based_etl_spark.operators.dedup import portable_hash, shingle_rows

    def wide_hashed(df: DataFrame) -> DataFrame:
        return shingle_rows(df, id_col, text_col, n, distinct=False).select(
            "id", portable_hash(F.col("s"), hex_chars=15).alias("h")
        )

    corpus = wide_hashed(docs).distinct()
    if max_df is not None:
        hot = (
            corpus.groupBy("h")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_df)
            .select("h")
        )
        corpus = corpus.join(F.broadcast(hot), "h", "left_anti")
    bench = wide_hashed(benchmark).distinct().select(
        F.col("id").alias("bench_id"), "h"
    )
    return (
        corpus.join(F.broadcast(bench), "h")
        .groupBy("id", "bench_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_shared)
        .select(F.col("id").alias("doc_id"), "bench_id", "shared_ngrams")
    )


BLOOM_M = 1 << 17  # bitmap bits — fixed so the oracle SQL is static
BLOOM_K = 3        # hash functions per n-gram


def _md5_hex_bigint(m: Column, start: int, width: int) -> Column:
    """Parse the md5-hex substring ``[start, start+width)`` (1-based)
    as a bigint — the same conv()-free instr parse as
    ``dedup.portable_hash``, but over an ALREADY-computed md5 column:
    Bloom double hashing (Kirsch–Mitzenmacher, "Less Hashing, Same
    Performance") derives all k probe positions as ``h1 + j·h2`` from
    one 128-bit digest, so the expensive md5 runs once per gram
    instead of k times. One parsed SQL string per call (see
    ``dedup.col_sql`` — per-term Column construction was measurable
    driver-side py4j cost; the ``m`` expressions passed here must obey
    col_sql's re-parse contract). Under Spark Connect (no
    ``Column._jc``) the same tree is built with Column operators."""
    from sql_based_etl_spark.operators.dedup import col_sql, md5_hex_bigint_sql

    if hasattr(m, "_jc"):
        return F.expr(md5_hex_bigint_sql(col_sql(m), start, width))
    out = F.lit(0).cast("bigint")
    for k in range(width):
        digit = (
            F.instr(F.lit("0123456789abcdef"), F.substring(m, start + k, 1)) - 1
        ).cast("bigint")
        out = out + digit * F.lit(16 ** (width - 1 - k)).cast("bigint")
    return out


def _bloom_positions(k_hashes: int, m_bits: int) -> list[Column]:
    """The ``k`` probe positions of the gram in column ``__m`` (its
    md5 hex): ``(h1 + j·h2) % m_bits`` with h1 = hex[1:9],
    h2 = hex[9:17] — reproduced verbatim by the DuckDB oracle."""
    from sql_based_etl_spark.operators.dedup import md5_hex_bigint_sql

    h1 = md5_hex_bigint_sql("`__m`", 1, 8)
    h2 = md5_hex_bigint_sql("`__m`", 9, 8)
    return [F.expr(f"({h1} + {j} * {h2}) % {m_bits}") for j in range(k_hashes)]


def bloom_build(
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    m_bits: int = BLOOM_M,
    k_hashes: int = BLOOM_K,
) -> list[int]:
    """Build a Bloom-filter bitmap of the benchmark's distinct word
    ``n``-grams: each gram sets ``k_hashes`` bits at positions
    ``(h1 + j·h2) % m_bits`` where h1/h2 are slices of ONE md5 digest
    (:func:`_bloom_positions` — double hashing, so any engine
    reproduces the identical bitmap, false positives included).

    Returns ``m_bits/64`` signed int64 words, built driver-side from
    the collected distinct positions. That collect is metadata-sized
    BY CONSTRUCTION: eval benchmarks are thousands of documents, so
    positions ≤ |bench grams|·k ≪ m_bits — this is exactly the
    "aggregate small state to the driver, broadcast it back" shape of
    a Spark broadcast variable, never a corpus-side collect. Grams are
    NOT pre-deduplicated (``distinct=False``): the only distinct that
    matters is over the int positions, which shuffles ints, not gram
    strings."""
    from sql_based_etl_spark.operators.dedup import shingle_rows

    grams = shingle_rows(
        benchmark, id_col, text_col, n=n, distinct=False
    ).withColumn("__m", F.md5(F.col("s")))
    pos_cols = [p.alias("p") for p in _bloom_positions(k_hashes, m_bits)]
    positions = (
        # bounded collect: distinct bit positions ≤ m_bits (131072 ints
        # for the 16 KiB default) regardless of benchmark size — the
        # driver materializes a bitmap index, never data rows
        grams.select(F.explode(F.array(*pos_cols)).alias("pos")).distinct().collect()
    )
    words = [0] * (m_bits // 64)
    for row in positions:
        p = row.pos
        words[p >> 6] |= 1 << (p & 63)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_decontaminate(
    docs: DataFrame,
    bloom: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    m_bits: int = BLOOM_M,
    k_hashes: int = BLOOM_K,
    min_shared: int = 1,
) -> DataFrame:
    """Bloom-filter benchmark decontamination — the cheapest possible
    membership check at 100 TB: where :func:`decontaminate` pays a
    broadcast JOIN against the benchmark's inverted index, this pays
    NO join at all. The bitmap rides into every task as one literal
    (``m_bits/8`` bytes ≈ 16 KiB at the defaults) and the per-gram
    test is ``k_hashes`` md5+bit-probes inside whole-stage codegen,
    pipelined straight out of the scan.

    Tradeoff (the standard Bloom contract): zero false negatives —
    every true benchmark gram is flagged — plus a deterministic,
    engine-reproducible false-positive set (~(grams·k/m)^k rate; same
    md5 positions on both sides, so the oracle reproduces even the
    false positives bit-for-bit). Use it to cheaply PRE-FILTER at
    corpus scale, then confirm hits with the exact inverted-index
    :func:`decontaminate` over the (tiny) flagged subset.

    Returns ``(doc_id, flagged_ngrams)`` for docs with ≥ ``min_shared``
    distinct bloom-positive ``n``-grams.

    Shuffle shape: the membership test runs on the RAW gram stream
    (``distinct=False``) straight out of the scan, and only the
    SURVIVORS — true contamination plus the small false-positive set —
    are deduplicated per doc. Testing after a global gram distinct
    would shuffle every gram string in the corpus first; filtering
    first shuffles ~nothing, which is the entire point of a Bloom
    pre-filter.

    The bitmap arrives via a broadcast single-row join, NOT as an
    inline array literal: a 2048-element literal array embedded in the
    predicate overflows Janino (codegen compile failure → the whole
    probe stage silently drops to interpreted evaluation, measured
    ~10× slower); as a broadcast attribute the probe stays inside
    whole-stage codegen.
    """
    from sql_based_etl_spark.operators.dedup import shingle_rows

    bm_df = F.broadcast(
        docs.sparkSession.createDataFrame(
            [(bloom,)], schema="__bm array<bigint>"
        )
    )
    grams = (
        shingle_rows(docs, id_col, text_col, n=n, distinct=False)
        .withColumn("__m", F.md5(F.col("s")))
        .crossJoin(bm_df)
    )
    for j, p in enumerate(_bloom_positions(k_hashes, m_bits)):
        grams = grams.withColumn(f"__p{j}", p)
    member = F.lit(True)
    for j in range(k_hashes):
        member = member & F.expr(
            f"(element_at(__bm, cast(__p{j} div 64 as int) + 1)"
            f" & shiftleft(cast(1 as bigint), cast(__p{j} % 64 as int))) <> 0"
        )
    return (
        grams.filter(member)
        .select("id", "s")
        .distinct()
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("flagged_ngrams"))
        .filter(F.col("flagged_ngrams") >= min_shared)
        .select(F.col("id").alias(id_col), "flagged_ngrams")
    )


def tfidf_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` keywords per document by tf-idf — the classic
    content-descriptor / topic-tagging signal of a document-processing
    pipeline. ``score = tf · ln(N / df)`` with N = total input docs.

    Shape at 100 TB: term frequencies are a map-side-combinable
    ``(id, word)`` count; document frequencies aggregate the tf
    relation (≤1 row per (doc, word), so the zipfian word key is NOT
    skew-amplifying — the tf⋈df join emits exactly |tf| rows); the
    corpus size is a broadcast 1-row aggregate, never a collect. The
    final top-k window shuffles on the doc id. Document text never
    rides a shuffle — only (int, word-token, count) rows do.

    Output: ``(doc_id, word, tf, df, score, rank)``, rank 1..k per doc
    (desc score, asc word tie-break). Docs with no words emit no rows.
    """
    words = df.select(
        F.col(id_col).alias("id"), F.explode(words_col(text_col)).alias("word")
    )
    tf = words.groupBy("id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("__n"))
    score = F.round(
        F.col("tf") * F.log(F.col("__n").cast("double") / F.col("df")), 6
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("word"))
    return (
        tf.join(dfreq, "word")
        .crossJoin(F.broadcast(n_docs))
        .select("id", "word", "tf", "df", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("id").alias(id_col), "word", "tf", "df", "score", "rank")
    )


def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Gopher-style per-document repetition signals (Rae et al. 2021,
    "Scaling Language Models", table A1 analogues): unigram
    concentration and duplicate-n-gram fractions — the standard
    pretraining filter for degenerate/templated text.

    - ``top_word_frac``:  occurrences of the most frequent word / words
    - ``dup_2gram_frac``: fraction of 2-gram occurrences that are
      repeats (1 - distinct/total)
    - ``dup_3gram_frac``: same for 3-grams

    Shape at 100 TB: one tagged union of hashed 1/2/3-gram rows feeds a
    single (id, gram_size, hash) count → (id, gram_size) rollup →
    conditional-aggregation pivot. Both groupBys combine map-side, the
    shuffle rows are three ints + a count, and document text never
    leaves the scan stage. N-grams are reduced to the 28-bit portable
    hash (operators/dedup.py) — the DuckDB oracle hashes identically,
    so parity is exact even in the astronomically-unlikely collision
    case (the same collision happens on both sides).

    Docs shorter than n words contribute their full text as the single
    n-gram (shingle_rows semantics), so the fractions are defined (0)
    rather than NULL for 1-2-word docs; empty docs have no words at
    all and surface NULL n_words/top_word_frac.
    """
    from sql_based_etl_spark.operators.dedup import portable_hash, shingle_rows

    grams = None
    for n in (1, 2, 3):
        rows = shingle_rows(df, id_col, text_col, n=n, distinct=False).select(
            "id", F.lit(n).alias("g"), portable_hash(F.col("s"), 7).alias("h")
        )
        grams = rows if grams is None else grams.unionByName(rows)
    per_gram = grams.groupBy("id", "g", "h").agg(F.count(F.lit(1)).alias("n"))
    per_size = per_gram.groupBy("id", "g").agg(
        F.sum("n").alias("tot"),
        F.count(F.lit(1)).alias("dst"),
        F.max("n").alias("mx"),
    )

    def pick(g: int, col: str):
        return F.max(F.when(F.col("g") == g, F.col(col)))

    return per_size.groupBy("id").agg(
        pick(1, "tot").alias("n_words"),
        F.round(pick(1, "mx") / pick(1, "tot"), 6).alias("top_word_frac"),
        F.round((pick(2, "tot") - pick(2, "dst")) / pick(2, "tot"), 6).alias(
            "dup_2gram_frac"
        ),
        F.round((pick(3, "tot") - pick(3, "dst")) / pick(3, "tot"), 6).alias(
            "dup_3gram_frac"
        ),
    ).select(
        F.col("id").alias(id_col),
        "n_words",
        "top_word_frac",
        "dup_2gram_frac",
        "dup_3gram_frac",
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_words: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into fixed-size word windows with overlap — the
    standard pre-tokenization chunking step of a training-data pipeline
    (long documents must become model-context-sized samples; overlap
    preserves cross-boundary context).

    Chunk i covers words [i·stride, i·stride + max_words) with
    stride = max_words - overlap. Codegen-friendly: the chunk indices
    come from ``posexplode(sequence(...))`` and each chunk's text from
    ``slice``/``concat_ws`` with a computed start — no higher-order
    lambda anywhere, so the whole operator pipelines off the scan
    (plan-asserted). Empty docs produce no chunks.

    Returns ``(id, chunk_idx, n_words, chunk_text)``.
    """
    from sql_based_etl_spark.operators.dedup import words_col

    stride = max_words - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than max_words")
    base = df.select(F.col(id_col).alias("id"), words_col(text_col).alias("wd"))
    # number of chunks: 1 + ceil(max(len - max_words, 0) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(F.size("wd") - max_words, F.lit(0)) / F.lit(stride)
    ).cast("int")
    chunks = base.filter(F.size("wd") > 0).select(
        "id",
        "wd",
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx", "_"),
    )
    piece = F.slice("wd", F.col("chunk_idx") * stride + 1, max_words)
    return chunks.select(
        "id",
        "chunk_idx",
        F.size(piece).alias("n_words"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def pack_chunks(
    chunks: DataFrame,
    id_col: str = "id",
    idx_col: str = "chunk_idx",
    words_col_name: str = "n_words",
    budget: int = 256,
) -> DataFrame:
    """Deterministic sequence packing: assign chunks, in (doc, chunk)
    order, to consecutive bins of ~``budget`` words — the sample-packing
    step that keeps training batches dense.

    Bin id = floor((running_total - n_words) / budget) over the global
    order: a window cumulative sum, reproducible in any engine (unlike
    first-fit-decreasing, whose result depends on iteration order).
    A global window implies a single-partition sort at this altitude —
    at 100 TB pack per shard instead: partition the window by a
    hash-bucket column so bins are shard-local (the padding loss at
    shard boundaries is one partial bin per shard, negligible).

    Returns the input plus ``bin_id``.
    """
    w = Window.orderBy(F.col(id_col).asc(), F.col(idx_col).asc())
    running = F.sum(words_col_name).over(w)
    return chunks.withColumn(
        "bin_id",
        F.floor((running - F.col(words_col_name)) / F.lit(budget)).cast("long"),
    )


def ngram_lm_perplexity(
    docs: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style language-model quality signal (Wenzek et al.,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data", LREC 2020): score each document by the average negative
    log-likelihood of its word bigrams under an add-one bigram LM
    trained on a *reference* corpus — the cheap, training-free stand-in
    for the KenLM perplexity filter every large-scale LLM data pipeline
    runs. Low ``nll_micros`` = fluent, reference-like text; high =
    gibberish, boilerplate soup, or wrong-language content. Thresholding
    (or head/middle/tail bucketing, CCNet §4.3) is the caller's policy.

    Model: ``p(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)`` with counts
    from the reference's bigram relation and ``V`` = its distinct
    second-word vocabulary — additive smoothing keeps every probability
    finite without a backoff join chain, and every quantity is an exact
    integer, so the DuckDB oracle replays the model bit-for-bit. The
    only float is the final ``ln``, pinned to integer micros
    (``round(ln(p)·1e6)``) before aggregation so cross-engine float
    noise cannot reach the summed result.

    Scale shape: training is two map-side-combinable groupBy counts
    over the reference's bigrams plus ONE bounded driver scalar (the
    vocabulary size — a count, not a collect). Scoring is the corpus
    bigram stream left-joined to the two count relations (plain
    equi-joins; count tables are unique per key, so hot bigrams do not
    amplify rows — AQE skew-split handles partition imbalance), then
    one combinable per-doc aggregate. Document text never shuffles —
    only (id, bigram-string) rows do.

    Returns ``(doc_id, n_bigrams, nll_micros)`` — ``nll_micros`` is
    integer-micros average NLL (``div``, exact); docs with fewer than
    two words emit no row (no bigrams → no evidence).
    """
    from sql_based_etl_spark.operators.dedup import shingle_rows

    def bigrams(df: DataFrame) -> DataFrame:
        # shingle_rows collapses <n-word docs to a single short shingle;
        # those are not bigrams — keep exactly the two-word grams
        return shingle_rows(df, id_col, text_col, n=2, distinct=False).filter(
            F.instr("s", " ") > 0
        )

    ref_bi = bigrams(reference)
    bi_counts = ref_bi.groupBy("s").agg(F.count(F.lit(1)).alias("__c12"))
    w1_of = F.split(F.col("s"), " ").getItem(0)
    w1_counts = (
        ref_bi.select(w1_of.alias("__w1"))
        .groupBy("__w1")
        .agg(F.count(F.lit(1)).alias("__c1"))
    )
    # bounded driver scalar (ONE long): |vocab| for the smoothing
    # denominator — an aggregate, never a row collect
    vocab = (
        ref_bi.select(F.split(F.col("s"), " ").getItem(1).alias("w2"))
        .distinct()
        .count()
    )

    p = (F.coalesce(F.col("__c12"), F.lit(0)) + F.lit(1)).cast("double") / (
        F.coalesce(F.col("__c1"), F.lit(0)) + F.lit(int(vocab))
    ).cast("double")
    logp_micros = F.round(F.log(p) * F.lit(1_000_000.0)).cast("bigint")
    return (
        bigrams(docs)
        .join(bi_counts, "s", "left")
        .withColumn("__w1", w1_of)
        .join(w1_counts, "__w1", "left")
        .select("id", logp_micros.alias("__lp"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (-F.sum("__lp")).alias("__nll_sum"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_bigrams",
            F.expr("__nll_sum div n_bigrams").alias("nll_micros"),
        )
    )
