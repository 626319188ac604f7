"""Deduplication operators over a document table.

Five strategies, each a composition of built-in DataFrame ops (no
UDFs — everything stays in whole-stage codegen):

- exact:          hash-groupBy on the raw text
- MinHash + LSH:  shingle → portable 60-bit hash → K permutations →
                  band buckets → candidate join → exact-Jaccard verify
- SimHash:        per-token hash bit votes → 48-bit signature →
                  block join (pigeonhole) → Hamming filter
- n-gram Jaccard: inverted-index token join (exact, no hashing)
- embedding cosine: see operators/similarity.py

Portability: hashes derive from md5 hex (identical in any engine), so
the DuckDB oracles reproduce results bit-for-bit. At 100 TB:
- the shingle/signature maps are narrow projections (map-side only);
- LSH candidate generation shuffles on (band, key) — hot buckets are
  the skew risk, so ``max_bucket`` caps them (boilerplate/empty docs
  collapse into mega-buckets otherwise);
- the verify join shuffles pairs once on doc_id.

Cache lifecycle: the pair operators persist small intermediate
relations (hashed shingles, postings, candidate pairs) that feed
multiple consumers INSIDE one returned plan — via
:func:`sql_based_etl_spark.caching.pin`, which registers each barrier
with the caller's active ``cache_scope()`` (or the engine
PipelineContext's scope) so it is unpersisted when the owner closes,
AFTER the caller's action. The operators never unpersist themselves:
the returned DataFrame is lazy and unpersisting before the caller
materializes it would defeat the reuse. Without a scope, barriers are
caller-owned process-lifetime caches (``spark.catalog.clearCache()``
between batches, as bench.py does, or LRU eviction); nothing here pins
executor memory beyond MEMORY_AND_DISK defaults.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sql_based_etl_spark.caching import pin

P = 2_147_483_647  # 2^31 - 1 (Mersenne prime) — keeps a*h + b inside int64

# Deterministic permutation parameters (LCG from a fixed seed; the same
# literals are embedded in the DuckDB oracle SQL).
def _lcg_params(k: int, seed: int = 42) -> tuple[list[int], list[int]]:
    a_list, b_list = [], []
    x = seed
    for _ in range(k):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a_list.append(1 + x % (P - 1))
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b_list.append(x % P)
    return a_list, b_list


NUM_HASHES = 32
BANDS = 8
ROWS_PER_BAND = NUM_HASHES // BANDS
MINHASH_A, MINHASH_B = _lcg_params(NUM_HASHES)

SIMHASH_BITS = 48
SIMHASH_BLOCKS = 4  # Hamming ≤ 3 ⇒ some block of 4 is identical

# default document-frequency cutoff for the n-gram inverted index: a
# shingle shared by d docs emits d² candidate rows in the self-join, so
# boilerplate shingles (licenses, headers) must leave the index
NGRAM_MAX_DF = 1000


def words_col(text: str | Column = "text") -> Column:
    """Lowercased whitespace tokens, empties removed.

    Lambda-free on purpose: whitespace runs are collapsed with
    regexp_replace and split on a single space, because higher-order
    functions (F.filter/F.transform lambdas) are CodegenFallback and
    poison every operator in their stage into interpreted evaluation
    (measured ~10-40× slowdowns on the dedup pipelines)."""
    c = F.col(text) if isinstance(text, str) else text
    norm = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    # split("", " ") yields [""] — map empty/whitespace-only docs to an
    # empty array so token counts agree with the oracles' len>0 filters
    return F.when(F.length(norm) == 0, F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def shingles_col(words: Column, n: int = 3) -> Column:
    """Distinct word n-grams as an array column (lambda-based; kept for
    API completeness and small inputs — the pipelines below use the
    codegen-friendly exploded :func:`shingle_rows` instead)."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    )


def shingle_rows(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                 n: int = 3, distinct: bool = True) -> DataFrame:
    """Exploded DISTINCT word n-gram shingles ``(id, s)`` — the scalable
    and codegen-friendly formulation.

    Long docs: ``arrays_zip`` of the words array with its 1..n-1 step
    ``slice`` offsets, exploded — each n-gram is assembled entirely
    inside one projection, with NO shuffle at all (the earlier
    window-``lead`` formulation paid a per-doc shuffle + sort before a
    single shingle existed). Docs shorter than n words collapse to a
    single shingle of the normalized text (matches
    :func:`shingles_col` semantics).
    """
    base = df.select(F.col(id_col).alias("id"), words_col(text_col).alias("wd"))
    if n > 1:
        shifted = [
            F.expr(f"slice(wd, {k + 1}, greatest(size(wd) - {k}, 0))").alias(f"w{k}")
            for k in range(1, n)
        ]
        zipped = base.select("id", "wd", *shifted).select(
            "id",
            F.posexplode(F.arrays_zip("wd", *[f"w{k}" for k in range(1, n)])).alias(
                "pos", "z"
            ),
        )
        long_sh = zipped.filter(F.col(f"z.w{n - 1}").isNotNull()).select(
            "id",
            F.concat_ws(
                " ", F.col("z.wd"), *[F.col(f"z.w{k}") for k in range(1, n)]
            ).alias("s"),
        )
        short_sh = base.filter(F.size("wd") < n).select(
            "id", F.concat_ws(" ", "wd").alias("s")
        )
        out = long_sh.unionByName(short_sh)
    else:
        out = base.select("id", F.explode("wd").alias("s"))
    return out.distinct() if distinct else out


def col_sql(c: str | Column) -> str:
    """SQL text of a column expression (one py4j round trip).

    Wide repeated-term expressions (hash polynomials, K-permutation
    mins, bit votes) are assembled as ONE SQL string parsed JVM-side
    instead of hundreds of per-operator ``Column`` calls: every
    ``F.xxx``/operator crosses the py4j boundary, and measured
    construction cost for the dedup queries was ~1.0-1.4s per query —
    pure driver-side chatter that a single ``F.expr`` parse avoids
    (guide §4: the Python boundary is also the *driver's* boundary).
    The parsed tree is expression-identical, so plans and results are
    unchanged.

    RE-PARSE CONTRACT: the rendered text must round-trip through
    ``F.expr`` to the same expression — true for the column refs /
    arithmetic / function calls used at the call sites here and in
    ``textops._md5_hex_bigint``; a caller introducing exotic literals
    must verify its rendering. Classic mode only (``Column._jc``):
    under Spark Connect there is no JVM node to render, so callers
    must take their Column-built fallback (see
    :func:`portable_hash`)."""
    if isinstance(c, str):
        return f"`{c}`"
    return c._jc.node().sql()  # noqa: SLF001 — classic-mode Column


def md5_hex_bigint_sql(m_sql: str, start: int, width: int) -> str:
    """SQL for parsing md5-hex chars ``[start, start+width)`` (1-based)
    of the md5-hex expression ``m_sql`` as a bigint — the conv()-free
    instr/substring polynomial shared by every portable-hash consumer
    (``conv`` is CodegenFallback; stacked on a Generate it degrades the
    whole stage to interpreted evaluation, ~20× slower)."""
    terms = " + ".join(
        f"cast((instr('0123456789abcdef', substring({m_sql}, {start + k}, 1)) - 1) as bigint)"
        f" * cast({16 ** (width - 1 - k)} as bigint)"
        for k in range(width)
    )
    return f"({terms})"


def portable_hash_sql(s_sql: str, hex_chars: int = 15) -> str:
    """SQL rendering of :func:`portable_hash` over the SQL expression
    ``s_sql`` (see :func:`col_sql` for why a string)."""
    return md5_hex_bigint_sql(f"md5({s_sql})", 1, hex_chars)


def portable_hash(s: str | Column, hex_chars: int = 15) -> Column:
    """``4*hex_chars``-bit hash from md5 hex — reproducible in any
    engine with md5 (DuckDB:
    ``CAST('0x'||substr(md5(x),1,{hex_chars}) AS BIGINT)``).

    The hex parse is instr/substring terms instead of ``conv()``:
    ``conv`` is a CodegenFallback expression, and a fallback stacked on
    a Generate (explode) degrades the whole stage to pathological
    interpreted evaluation (~20× slower on the shingle pipeline).
    Callers pick the narrowest width they need — wide chains bloat the
    generated whole-stage method past the JIT limit. Built as one
    parsed SQL string (:func:`col_sql`): the 8×hex_chars Column calls
    of the per-term form were ~0.1s of py4j time per call site. Under
    Spark Connect (no ``Column._jc``) the same tree is built with
    Column operators instead — slower construction, identical plan."""
    if isinstance(s, str) or hasattr(s, "_jc"):
        return F.expr(portable_hash_sql(col_sql(s), hex_chars))
    m = F.md5(s)
    out = F.lit(0).cast("bigint")
    for k in range(hex_chars):
        digit = (
            F.instr(F.lit("0123456789abcdef"), F.substring(m, 1 + k, 1)) - 1
        ).cast("bigint")
        out = out + digit * F.lit(16 ** (hex_chars - 1 - k)).cast("bigint")
    return out


def hashed_shingle_rows(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Exploded shingles reduced to 28-bit int identities ``(id, h)``.

    7 hex chars = 28 bits: already < P, plenty for shingle identity
    (cross-collision odds ~n²/2²⁹ per doc pair), and the int relation
    is what every downstream consumer wants — signature permutations,
    inverted-index join keys, and Jaccard sets all shuffle ints, never
    the shingle strings."""
    return shingle_rows(df, id_col, text_col, n, distinct=False).select(
        "id", portable_hash(F.col("s"), hex_chars=7).alias("h")
    )


def minhash_signatures_from_hashes(hashed: DataFrame) -> DataFrame:
    """K-permutation MinHash signatures ``(id, m0..m{K-1})`` from a
    hashed ``(id, h)`` shingle relation.

    Formulated as exploded shingles → K plain ``min()`` aggregates
    rather than nested array lambdas: each permutation is simple int
    arithmetic inside whole-stage codegen with map-side partial
    aggregation, so the only shuffle is the per-doc combine. (The
    lambda formulation re-evaluates the md5 subtree K× per row after
    projection collapse and runs interpreted — ~50× slower.)
    ``min()`` is duplicate-insensitive, so non-distinct shingles give
    the same signature without paying a distinct shuffle.
    """
    mins = [
        F.expr(f"min(({MINHASH_A[j]} * h + {MINHASH_B[j]}) % {P}) as m{j}")
        for j in range(NUM_HASHES)
    ]
    return hashed.groupBy("id").agg(*mins)


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """K-permutation MinHash signatures ``(id, m0..m{K-1})`` columns."""
    return minhash_signatures_from_hashes(hashed_shingle_rows(df, id_col, text_col, n))


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: keep the lowest id per identical text. One shuffle
    keyed on the 128-bit md5 of the text, so document bytes never ride
    the shuffle — each mapper emits (digest, min_id, count) partials
    and the combine is text-free. md5 collisions are the standard
    content-identity gamble (~n²/2¹²⁹: ~1e-15 even at 10¹² docs);
    callers needing literal-equality guarantees can group on the text
    itself at the cost of shuffling it."""
    return (
        df.select(id_col, F.md5(F.col(text_col)).alias("__m"))
        .groupBy("__m")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .select(id_col, "n_copies")
    )


def digest_index(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The historical content index incremental dedup joins against:
    one ``digest`` (md5 hex) row per distinct document text. Tiny
    relative to the corpus (16 bytes of identity per distinct doc) —
    the thing a daily pipeline appends to a versioned table after each
    batch."""
    return df.select(F.md5(F.col(text_col)).alias("digest")).distinct()


def exact_dedup_incremental(
    new_df: DataFrame,
    seen: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental exact dedup — the shape a production pipeline runs
    DAILY: deduplicate a new batch within itself AND against the
    historical :func:`digest_index` of everything already ingested,
    returning ``(id, n_copies)`` for the batch's surviving documents
    (lowest id per digest, digest unseen historically).

    Scale shape: the within-batch pass is the same text-free
    (digest, min_id, count) combine as :func:`exact_dedup`; the
    historical check is a LEFT ANTI join on the 128-bit digest — both
    sides shuffle 16-byte digests, never document text, and the anti
    join's build side is the (small) batch aggregate, so at 100 TB the
    historical index streams past it without materializing. Appending
    ``digest_index`` of the kept rows back to the versioned index table
    closes the loop (see ``DedupTransform``'s ``seenURI`` option)."""
    batch = (
        new_df.select(id_col, F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
    )
    seen_digests = seen.select(F.col(seen.columns[0]).alias("digest"))
    return batch.join(seen_digests, "digest", "left_anti").select(id_col, "n_copies")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_bucket: int = 1000,
    n: int = 3,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs with exact-Jaccard verification.

    candidates: docs sharing any (band, band-key) bucket; buckets larger
    than ``max_bucket`` are dropped (skew guard — at 100 TB a hot bucket
    of boilerplate text would otherwise produce a quadratic join).
    Output: (doc_a, doc_b, jaccard) with jaccard ≥ threshold.

    Candidate generation uses bucket POSTINGS lists (same shape as
    :func:`ngram_jaccard_pairs`, measured 4.3s → 3.1s at sf0.1): group
    the banded signatures by (band, key) ONCE, keep buckets with
    2..max_bucket members (the skew guard becomes a free size filter —
    no hot-list groupBy + anti-join pass), and expand each sorted
    postings array's i<j combinations codegen-side. The old band
    self-join shuffled the bands relation onto the bucket key twice and
    scanned the signature table for both sides; postings pay the bucket
    shuffle once and bound every array at ``max_bucket`` ids.
    """
    # ONE hashed-shingle relation (id, h) feeds both the signatures and
    # the Jaccard verify — the shingle explosion + md5 run exactly once
    # and the persisted relation is two ints per row (caching the raw
    # shingle *strings* instead measured 2.5× slower than recomputing
    # them; ints are cheap to hold and cheap to shuffle). min() and
    # collect_set are duplicate-insensitive, so no distinct shuffle.
    hashed = hashed_shingle_rows(df, id_col, text_col, n).transform(pin)

    # band keys as explicit column expressions + stack(): everything
    # stays in whole-stage codegen (no array lambdas); signature mins
    # and band concat fused into ONE aggregate (_banded_keys_from_hashes)
    bands = _banded_keys_from_hashes(hashed)
    post = (
        bands.groupBy("band", "key")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    pair_expr = F.expr(
        "flatten(transform(ids, (a, i) -> "
        "transform(slice(ids, i + 2, size(ids) - i - 1), "
        "b -> struct(a as doc_a, b as doc_b))))"
    )
    cand = (
        post.select(F.explode(pair_expr).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
        # two consumers (the candidate-id broadcast for the verify
        # semi-join, and the final pair join) — persist the tiny pair
        # list so the bucket expansion runs once
        .transform(pin)
    )

    return _verify_jaccard(cand, hashed, threshold)


def _verify_jaccard(cand: DataFrame, hashed: DataFrame, threshold: float) -> DataFrame:
    """Exact-Jaccard verify on the candidate pairs only: semi-join the
    hashed-shingle relation down to candidate docs before the
    collect_set, so the verify shuffle carries candidate shingle sets,
    not the whole corpus (candidates ≪ corpus by construction —
    that's the point of the blocking). Jaccard is computed over the
    28-bit shingle identities (standard dedup-pipeline practice; the
    oracle hashes identically, so the match stays exact)."""
    cand_ids = (
        cand.select(F.col("doc_a").alias("id"))
        .union(cand.select(F.col("doc_b").alias("id")))
        .distinct()
    )
    sh = (
        hashed.join(F.broadcast(cand_ids), "id", "leftsemi")
        .groupBy("id")
        .agg(F.collect_set("h").alias("sh"))
        # consumed twice below (sh_a/sh_b): without an explicit persist
        # the whole upstream (shingle+hash of the corpus slice) runs
        # once per side UNLESS Catalyst's ReuseExchange happens to fire
        # — which is plan-shape-dependent and was measured as a bimodal
        # 6.7s/9.6s swing on the incremental path. Candidate shingle
        # sets only (candidates ≪ corpus), so the cache is small.
        .transform(pin)
    )
    sh_a = sh.select(F.col("id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    # persist BARRIER between scoring and thresholding: a bare
    # filter(jaccard >= t) is pushed into the verify join's CONDITION,
    # so the set intersection over the shingle arrays runs TWICE per
    # candidate pair (condition + projection) — and a join condition
    # that heavy also degrades the stage out of whole-stage codegen.
    # The cached relation is (doc_a, doc_b, jaccard) — candidate pairs
    # only, far smaller than the shingle sets it was computed from.
    scored = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .select("doc_a", "doc_b", F.round(inter / union, 6).alias("jaccard"))
        .transform(pin)
    )
    return scored.filter(F.col("jaccard") >= threshold)


def _banded_keys_from_hashes(hashed: DataFrame) -> DataFrame:
    """``(id, band, key)`` directly from the hashed ``(id, h)`` shingle
    relation: the per-band ``concat_ws`` of the K permutation mins is
    computed INSIDE the signature aggregate's result projection, fusing
    :func:`minhash_signatures_from_hashes` + :func:`_stacked_bands`
    into one aggregate + one stack projection (r14: two fewer analyzed
    DataFrame ops per construction — the residual dedup_minhash_lsh
    driver cost was ~1k py4j round trips of eager per-op JVM analysis).
    The band keys are bit-identical (same mins, same concat order);
    partial/map-side aggregation of the mins is unchanged — only the
    final-aggregate projection differs."""
    band_keys = [
        "concat_ws(',', "
        + ", ".join(
            f"min(({MINHASH_A[j]} * h + {MINHASH_B[j]}) % {P})"
            for j in (b * ROWS_PER_BAND + r for r in range(ROWS_PER_BAND))
        )
        + f") as bk{b}"
        for b in range(BANDS)
    ]
    stack_args = ", ".join(f"{b}, bk{b}" for b in range(BANDS))
    return (
        hashed.groupBy("id")
        .agg(*[F.expr(bk) for bk in band_keys])
        .select("id", F.expr(f"stack({BANDS}, {stack_args}) as (band, key)"))
    )


def minhash_bands_from_hashes(hashed: DataFrame) -> DataFrame:
    """Banded LSH bucket keys ``(id, band, key)`` from a hashed-shingle
    relation — the thing an incremental pipeline PERSISTS between daily
    runs (alongside the ``(id, h)`` relation itself) so tomorrow's
    batch probes yesterday's buckets without recomputing the corpus."""
    return _banded_keys_from_hashes(hashed)


def minhash_lsh_pairs_incremental(
    new_docs: DataFrame,
    old_hashed: DataFrame,
    old_bands: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_bucket: int = 1000,
    n: int = 3,
    new_hashed: DataFrame | None = None,
) -> DataFrame:
    """Incremental MinHash-LSH near-dup — the shape a production
    pipeline runs DAILY: pair the new batch against itself AND the
    historical corpus WITHOUT ever re-pairing old×old (which is
    quadratically re-paid work the previous runs already did).

    The historical state is two stored relations, both int-cheap:
    ``old_hashed`` = the corpus ``(id, h)`` hashed-shingle relation
    (feeds the Jaccard verify), and ``old_bands`` = its banded bucket
    keys from :func:`minhash_bands_from_hashes` (probed by the new
    batch; derived from ``old_hashed`` when not supplied, but a real
    pipeline persists it — the whole point is NOT touching the old
    corpus text). After the run, append the new batch's rows to both
    tables to close the loop (mirrors ``exact_dedup_incremental``'s
    digest-index contract).

    Shape at 100 TB: the candidate join probes the (partitioned)
    historical postings with the new batch's bucket keys — old rows
    outside probed buckets are never read past the join's shuffle
    pruning; the hot-bucket guard counts ONLY probed buckets; the
    verify semi-joins both shingle relations down to candidate ids.
    Output: ``(doc_a, doc_b, jaccard)`` pairs with ≥1 new doc.
    """
    if new_hashed is None:
        # callers that already hold the batch's hashed relation (the
        # streaming wrapper persists it to append to the stored index
        # afterwards) pass it in instead of paying the shingle pass twice
        new_hashed = hashed_shingle_rows(new_docs, id_col, text_col, n).transform(pin)
    new_bands = minhash_bands_from_hashes(new_hashed)
    if old_bands is None:
        old_bands = minhash_bands_from_hashes(old_hashed)
    all_bands = old_bands.unionByName(new_bands)

    # hot-bucket skew guard over the buckets the new batch actually
    # probes (semi-join first — counting every historical bucket would
    # scan state the batch never touches)
    probed = new_bands.select("band", "key").distinct().transform(pin)
    # consumed TWICE (the hot-bucket count broadcast, then the candidate
    # join's build side) in SEPARATE jobs — broadcast exchanges each run
    # their own job, so ReuseExchange cannot dedupe the two scans and
    # without a persist the old-corpus banding (shingle+md5+minhash over
    # the whole index) runs once per consumer. That recompute was the
    # documented bimodal 6.7s/9.6s swing on this path: whether the
    # second scan got a warm page cache decided the mode. The persisted
    # slice is post-semi-join (probed buckets only, ≪ index) and
    # int+string-key rows, so the cache is small and the second
    # consumer always reads it instead of re-banding the index.
    probed_all = all_bands.join(
        F.broadcast(probed), ["band", "key"], "leftsemi"
    ).transform(pin)
    hot = (
        probed_all.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") > max_bucket)
        .select("band", "key")
    )
    nb = new_bands.join(F.broadcast(hot), ["band", "key"], "left_anti").select(
        F.col("id").alias("new_id"), "band", "key"
    )
    ab = probed_all.join(F.broadcast(hot), ["band", "key"], "left_anti").select(
        F.col("id").alias("other_id"), "band", "key"
    )
    cand = (
        nb.join(ab, ["band", "key"])
        .filter(F.col("new_id") != F.col("other_id"))
        .select(
            F.least("new_id", "other_id").alias("doc_a"),
            F.greatest("new_id", "other_id").alias("doc_b"),
        )
        .distinct()
        .transform(pin)
    )
    return _verify_jaccard(cand, old_hashed.unionByName(new_hashed), threshold)


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """48-bit SimHash signatures ``(id, sig)``: bit i is the sign of
    the vote sum of token-hash bit i over distinct tokens.

    Same scalable, codegen-friendly shape as MinHash: exploded distinct
    tokens → 48 conditional ``sum()`` aggregates (map-side combinable)
    → one bit-packing projection."""
    # 12 hex chars = exactly SIMHASH_BITS (48); distinct tokens via the
    # codegen-friendly exploded form
    # Explicit hash(id) repartition between the distinct and the md5 +
    # vote projection (r13, guide §2.5): the distinct's exchange is
    # ~1 MB of (id, token) rows, so AQE's byte-based coalescing folds
    # it to ONE partition — and the md5 polynomial + 48 bit votes per
    # token (the query's dominant compute, measured 1.1s serial at
    # sf0.1) then run on one core. Shuffle BYTES are the wrong cost
    # proxy for this stage; a user-specified keyed repartition is not
    # coalesced by AQE, spreads the token hashing over the cluster,
    # and the groupBy("id") below reuses the hash(id) partitioning —
    # no additional exchange. N = defaultParallelism (cluster-derived,
    # not a local constant); at real scale the distinct output exceeds
    # the advisory size anyway and the repartition is a cheap no-op
    # reshuffle of already-wide data.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    ex = (
        shingle_rows(df, id_col, text_col, n=1, distinct=True)
        .repartition(n_parts, "id")
        .select("id", portable_hash(F.col("s"), hex_chars=12).alias("h"))
    )
    votes = [
        F.expr(
            f"sum(case when (shiftright(h, {i}) & 1) = 1 then 1 else -1 end) as v{i}"
        )
        for i in range(SIMHASH_BITS)
    ]
    packed = " + ".join(
        f"(case when v{i} > 0 then cast({1 << i} as bigint)"
        " else cast(0 as bigint) end)"
        for i in range(SIMHASH_BITS)
    )
    return ex.groupBy("id").agg(*votes).select("id", F.expr(packed).alias("sig"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: block join (any of 4 12-bit blocks equal
    — pigeonhole guarantees recall for Hamming ≤ 3) + exact Hamming
    filter via bit_count(xor).

    Deliberately NOT the postings-list expansion minhash/ngram use:
    simhash's 12-bit blocks produce dense buckets and a large candidate
    volume (hundreds of thousands of pairs at sf0.1), and evaluating
    the pair lambda per candidate measured 1.5× SLOWER than keeping the
    codegen'd self-join + bit_count. Postings win when candidates ≪
    corpus (minhash/ngram); the self-join wins when the expansion
    itself is the bulk of the work."""
    block_bits = SIMHASH_BITS // SIMHASH_BLOCKS
    docs = simhash_signatures(df, id_col, text_col).transform(pin)
    mask = (1 << block_bits) - 1
    block_cols = [
        F.expr(f"shiftright(sig, {b * block_bits}) & {mask}").alias(f"blk{b}")
        for b in range(SIMHASH_BLOCKS)
    ]
    stack_args = ", ".join(f"{b}, blk{b}" for b in range(SIMHASH_BLOCKS))
    blocks = docs.select("id", "sig", *block_cols).select(
        "id", "sig", F.expr(f"stack({SIMHASH_BLOCKS}, {stack_args}) as (block, bkey)")
    )
    b2 = blocks.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "block", "bkey"
    )
    hamming = F.bit_count(F.col("sig").bitwiseXOR(F.col("sig_b")))
    return (
        blocks.join(b2, ["block", "bkey"])
        .filter(F.col("id") < F.col("id_b"))
        .select(
            F.col("id").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = NGRAM_MAX_DF,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join via shingle POSTINGS lists:
    group the (id, shingle-hash) index by shingle once, then generate
    candidate pairs by exploding each postings array's i<j combinations
    codegen-side. Pairs sharing no shingle can't clear any positive
    threshold, so the postings expansion is lossless over the retained
    shingles.

    Why postings beat the index self-join (the previous shape, bench
    3.13s → ~2.0s at sf0.1): the self-join shuffled the index relation
    onto the shingle key for BOTH join sides plus a third time for the
    df-guard groupBy; postings pay that shuffle ONCE, and the pair
    expansion (``transform``/``slice``/``flatten`` over the sorted ids
    array) runs where the postings row already lives. Candidate volume
    is identical (d·(d−1)/2 per shingle), the subsequent per-pair
    groupBy is the same, and the df guard becomes a free
    ``size(ids) <= max_df`` filter instead of a groupBy + anti-join.

    Document-frequency skew remains the 100 TB hazard: one boilerplate
    shingle shared by d documents means a d-element postings array and
    d² candidate rows. ``max_df`` drops such shingles from the
    similarity universe entirely (postings AND set sizes, so Jaccard
    stays well-defined: similarity over non-boilerplate shingles), and
    it also bounds every postings array at ``max_df`` ints — no
    single-row blowup. ``max_df=None`` (tests only) removes that bound
    and is NOT scale-safe: a viral shingle would collect an unbounded
    array.

    The postings hold 28-bit shingle-identity ints, never the n-gram
    text (the oracle hashes identically, so the match stays exact). The
    postings relation is persisted — it feeds both the per-doc sizes
    and the pair expansion, and is tiny (≤ max_df ints per retained
    shingle)."""
    inv = hashed_shingle_rows(df, id_col, text_col, n).distinct()
    post = inv.groupBy("h").agg(F.sort_array(F.collect_list("id")).alias("ids"))
    if max_df is not None:
        post = post.filter(F.size("ids") <= max_df)
    # NOT widened before the pin (r13 REJECTED experiment): spreading
    # the pinned postings to defaultParallelism partitions parallelizes
    # the i<j pair expansion (1.24s → 0.68s stage wall) but makes BOTH
    # sizes-aggregate consumers ~8× more expensive (0.1s → 0.8-0.9s
    # stage wall each — per-task columnar-cache decode overhead
    # multiplies with the partition count) — a net loss measured in the
    # r13 profiles. The multi-consumer pinned caches in this family
    # prefer few partitions.
    post = post.transform(pin)
    sizes = (
        post.select(F.explode("ids").alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    # i<j combinations of the sorted postings array: slice(ids, i+2, ...)
    # pairs each element only with its successors, so (a, b) always has
    # a < b without a post-filter over the expanded rows
    pair_expr = F.expr(
        "flatten(transform(ids, (a, i) -> "
        "transform(slice(ids, i + 2, size(ids) - i - 1), "
        "b -> struct(a as id, b as id_b))))"
    )
    shared = (
        post.filter(F.size("ids") >= 2)
        .select(F.explode(pair_expr).alias("p"))
        .select("p.id", "p.id_b")
        .groupBy("id", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sz_a = sizes.select(F.col("id"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    jac = F.col("shared") / (F.col("sz_a") + F.col("sz_b") - F.col("shared"))
    return (
        shared.join(sz_a, "id")
        .join(sz_b, "id_b")
        .select(
            F.col("id").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def positioned_hashed_shingles(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    hex_chars: int = 15,
) -> DataFrame:
    """Word ``n``-grams WITH their word offsets:
    ``(id, n_words, pos, h)`` — the positioned sibling of
    :func:`hashed_shingle_rows` for operators that need to know WHERE
    in the document a gram sits (substring-span dedup), not just that
    it exists. Same zero-shuffle zipped-slice assembly; 60-bit default
    hash because positioned consumers are membership-style (no
    downstream verify to absorb collisions).

    Docs shorter than ``n`` words contribute their full text as a
    single gram at pos 0 (shingle_rows semantics); empty docs emit
    nothing (there is no substring to deduplicate).
    """
    base = df.select(
        F.col(id_col).alias("id"), words_col(text_col).alias("wd")
    ).select("id", "wd", F.size("wd").alias("nw"))
    shifted = [
        F.expr(f"slice(wd, {k + 1}, greatest(size(wd) - {k}, 0))").alias(f"w{k}")
        for k in range(1, n)
    ]
    zipped = base.select("id", "nw", "wd", *shifted).select(
        "id",
        "nw",
        F.posexplode(F.arrays_zip("wd", *[f"w{k}" for k in range(1, n)])).alias(
            "pos", "z"
        ),
    )
    long_sh = zipped.filter(F.col(f"z.w{n - 1}").isNotNull()).select(
        "id",
        "nw",
        "pos",
        portable_hash(
            F.concat_ws(" ", F.col("z.wd"), *[F.col(f"z.w{k}") for k in range(1, n)]),
            hex_chars,
        ).alias("h"),
    )
    short_sh = base.filter((F.col("nw") > 0) & (F.col("nw") < n)).select(
        "id",
        "nw",
        F.lit(0).alias("pos"),
        portable_hash(F.concat_ws(" ", "wd"), hex_chars).alias("h"),
    )
    return long_sh.unionByName(short_sh)


def duplicated_substring_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Substring-level duplicate detection (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): find
    every maximal word-span of a document that is covered by
    ``n``-grams occurring ≥ ``min_count`` times ACROSS THE CORPUS
    (other docs or repeats within the same doc). Document-level dedup
    misses these — two distinct articles quoting the same boilerplate
    paragraph are not near-dups, but the paragraph still appears
    thousands of times in the training set. The published remedy is a
    suffix array; the distributed equivalent is this bounded-gram
    formulation: a duplicated substring of length ≥ n is exactly a run
    of duplicated n-grams, so maximal duplicated spans = merged
    intervals ``[pos, pos+n-1]`` of duplicated grams.

    Scale shape: gram assembly is shuffle-free codegen; the global
    occurrence count is a map-side-combinable groupBy on the 60-bit
    gram key (int pairs on the shuffle, never text); marking rides ONE
    full shuffle of the positioned relation joined against the
    (compact) duplicated-key set; span merging is a per-doc
    gaps-and-islands window (lag + cumulative sum — one shuffle on the
    doc id). The positioned relation is persisted across its two
    consumers (count + mark), mirroring minhash_lsh_pairs' contract:
    the cache is released when the returned plan's last action
    finishes or the session's executors drop it — callers running
    many corpora through long sessions should ``spark.catalog.clearCache()``
    between batches.

    Returns ``(doc_id, span_start, span_end, n_dup_grams)`` — word
    offsets, inclusive; a downstream trimmer drops or rewrites the
    spans. Spans from a short doc (< n words, whole-text gram) are
    capped at the doc's last word.
    """
    sh = positioned_hashed_shingles(df, id_col, text_col, n).transform(pin)
    dup_keys = (
        sh.groupBy("h")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= min_count)
        .select("h")
    )
    marked = sh.join(dup_keys, "h").select("id", "nw", "pos")
    w = Window.partitionBy("id").orderBy("pos")
    prev = F.lag("pos").over(w)
    # intervals are fixed-length [pos, pos+n-1]; merge overlapping OR
    # adjacent ranges: a new island starts when the gap to the previous
    # gram exceeds n (pos > prev_end + 1 with prev_end = prev + n - 1)
    new_island = F.when(prev.isNull() | (F.col("pos") > prev + n), 1).otherwise(0)
    islands = marked.withColumn("__isl", F.sum(new_island).over(w))
    return (
        islands.groupBy("id", "__isl")
        .agg(
            F.min("pos").alias("span_start"),
            F.least(F.max("pos") + F.lit(n - 1), F.min("nw") - 1).alias("span_end"),
            F.count(F.lit(1)).alias("n_dup_grams"),
        )
        .select(
            F.col("id").alias(id_col), "span_start", "span_end", "n_dup_grams"
        )
    )


def trim_duplicated_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply :func:`duplicated_substring_spans` output: rewrite each
    document with its duplicated word-spans removed, the way a
    substring-dedup pass actually edits the corpus. Documents with no
    spans pass through with their (normalized) text intact.

    Shape: spans explode to their covered ``(id, pos)`` positions
    (``sequence(span_start, span_end)`` — codegen, bounded by doc
    length); document words posexplode to ``(id, pos, word)``; one
    LEFT ANTI equi-join on (id, pos) drops covered words; surviving
    words re-assemble with an order-preserving
    ``array_sort(collect_list(struct(pos, word)))`` aggregate — one
    shuffle on the doc id, and only surviving words ride it. Output
    text is whitespace-normalized lowercase (words_col semantics), the
    canonical form the dedup pipeline already keys on.

    Returns ``(doc_id, clean_text, n_removed_words)``.
    """
    words = df.select(
        F.col(id_col).alias("id"), F.posexplode(words_col(text_col)).alias("pos", "w")
    )
    covered = spans.select(
        F.col(id_col).alias("id"),
        F.explode(F.sequence("span_start", "span_end")).alias("pos"),
    ).distinct()
    kept = words.join(covered, ["id", "pos"], "left_anti")
    n_words = words.groupBy("id").agg(F.count(F.lit(1)).alias("__n"))
    rebuilt = kept.groupBy("id").agg(
        F.expr("concat_ws(' ', transform(array_sort(collect_list(struct(pos, w))), s -> s.w))").alias(
            "clean_text"
        ),
        F.count(F.lit(1)).alias("__kept"),
    )
    return (
        n_words.join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            (F.col("__n") - F.coalesce("__kept", F.lit(0))).alias("n_removed_words"),
        )
    )
