"""Extension stages: the LLM-data-pipeline operators exposed through
the same declarative stage surface as the reference's stages, so a
pipeline config can mix SCD2 stages with dedup/similarity/text/
multimodal transforms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sql_based_etl_spark.engine.pipeline import PipelineContext, StageError


def dedup_transform(ctx: PipelineContext, conf: dict) -> DataFrame:
    """``DedupTransform``: method ∈ exact | exact_incremental |
    minhash_lsh | simhash | ngram_jaccard | substring_spans |
    embedding_cosine | semantic_cosine.

    ``exact_incremental`` is the daily-pipeline shape: dedup the input
    batch within itself and against the historical digest index at
    ``seenURI`` (a versioned table of md5 digests, or a view named by
    ``seenView``); the caller appends ``digest_index`` of the kept rows
    back to that table after the load commits."""
    from sql_based_etl_spark.operators import dedup, similarity

    df = ctx.view(conf["inputView"])
    method = conf.get("method", "exact")
    id_col = conf.get("idColumn", "doc_id")
    text_col = conf.get("textColumn", "text")
    if method == "exact":
        return dedup.exact_dedup(df, id_col, text_col)
    if method == "exact_incremental":
        if "seenView" in conf:
            seen = ctx.view(conf["seenView"])
        else:
            from sql_based_etl_spark.tables.versioned import VersionedTable

            seen = VersionedTable(ctx.spark, conf["seenURI"]).read()
        return dedup.exact_dedup_incremental(df, seen, id_col, text_col)
    if method == "minhash_lsh":
        return dedup.minhash_lsh_pairs(
            df, id_col, text_col,
            threshold=float(conf.get("threshold", 0.5)),
            max_bucket=int(conf.get("maxBucket", 1000)),
        )
    if method == "simhash":
        return dedup.simhash_pairs(
            df, id_col, text_col, max_hamming=int(conf.get("maxHamming", 3))
        )
    if method == "ngram_jaccard":
        return dedup.ngram_jaccard_pairs(
            df, id_col, text_col,
            n=int(conf.get("n", 3)), threshold=float(conf.get("threshold", 0.5)),
        )
    if method == "embedding_cosine":
        return similarity.cosine_dup_pairs(
            df,
            threshold=float(conf.get("threshold", 0.9)),
            id_col=conf.get("idColumn", "vec_id"),
            vec_col=conf.get("vectorColumn", "embedding"),
            dim=int(conf.get("dim", 64)),
        )
    if method == "minhash_incremental":
        # daily batch vs stored (id, h) index view (+ optional stored
        # banded-buckets view) — pairs touching the batch only
        old_hashed = ctx.view(conf["indexView"])
        old_bands = ctx.view(conf["bandsView"]) if "bandsView" in conf else None
        return dedup.minhash_lsh_pairs_incremental(
            df, old_hashed, old_bands, id_col, text_col,
            threshold=float(conf.get("threshold", 0.5)),
            max_bucket=int(conf.get("maxBucket", 1000)),
        )
    if method == "substring_spans":
        return dedup.duplicated_substring_spans(
            df, id_col, text_col,
            n=int(conf.get("n", 8)),
            min_count=int(conf.get("minCount", 2)),
        )
    if method == "trim_spans":
        # rewrite docs with duplicated spans removed; spansView reuses a
        # prior substring_spans stage's output, else detect inline
        spans = (
            ctx.view(conf["spansView"])
            if "spansView" in conf
            else dedup.duplicated_substring_spans(
                df, id_col, text_col,
                n=int(conf.get("n", 8)),
                min_count=int(conf.get("minCount", 2)),
            )
        )
        return dedup.trim_duplicated_spans(df, spans, id_col, text_col)
    if method == "semantic_cosine":
        # SemDeDup: k-means cells (trainIters Lloyd rounds over the
        # input itself; 0 = lowest-id seed pivots) → within-cell pairs
        kwargs = dict(
            id_col=conf.get("idColumn", "vec_id"),
            vec_col=conf.get("vectorColumn", "embedding"),
            dim=int(conf.get("dim", 64)),
        )
        n_cells = int(conf.get("nCells", similarity.IVF_CELLS))
        iters = int(conf.get("trainIters", 2))
        pivots = (
            similarity.kmeans_lloyd(df, k=n_cells, iters=iters, **kwargs)
            if iters > 0
            else None
        )
        return similarity.semantic_dedup_pairs(
            df,
            threshold=float(conf.get("threshold", 0.9)),
            n_cells=n_cells,
            pivots=pivots,
            **kwargs,
        )
    if method == "canonical":
        # pairs (from a prior pair-generating stage via pairsView, else
        # minhash inline) → connected components → keep the
        # max-quality member per cluster plus every singleton
        from sql_based_etl_spark.operators.graph import canonical_survivors

        pairs = (
            ctx.view(conf["pairsView"])
            if "pairsView" in conf
            else dedup.minhash_lsh_pairs(
                df, id_col, text_col,
                threshold=float(conf.get("threshold", 0.5)),
                max_bucket=int(conf.get("maxBucket", 1000)),
            )
        )
        return canonical_survivors(
            df, pairs, quality_col=conf["qualityColumn"], id_col=id_col
        )
    raise StageError(f"DedupTransform: unknown method {method!r}")


def similarity_search_transform(ctx: PipelineContext, conf: dict) -> DataFrame:
    """``SimilaritySearchTransform``: method ∈ brute_force | lsh_ann."""
    from sql_based_etl_spark.operators import similarity

    corpus = ctx.view(conf["inputView"])
    queries = ctx.view(conf.get("queriesView", conf["inputView"]))
    kwargs = dict(
        k=int(conf.get("k", 5)),
        id_col=conf.get("idColumn", "vec_id"),
        vec_col=conf.get("vectorColumn", "embedding"),
        dim=int(conf.get("dim", 64)),
    )
    method = conf.get("method", "brute_force")
    if method == "brute_force":
        return similarity.cosine_topk(queries, corpus, **kwargs)
    if method == "lsh_ann":
        return similarity.ann_topk(queries, corpus, **kwargs)
    if method == "hard_negatives":
        # query set = a predicate over the corpus view itself
        return similarity.hard_negative_topk(
            corpus,
            F.expr(conf.get("queryPredicate", "true")),
            label_col=conf.get("labelColumn", "label"),
            **kwargs,
        )
    if method == "pca":
        # train-then-project in one stage: the eigensolver runs on the
        # collected dim x dim covariance (metadata-sized), projection is
        # a broadcast join (operators/similarity.py:pca_train/project)
        comps = similarity.pca_train(
            corpus, vec_col=kwargs["vec_col"], dim=kwargs["dim"], k=kwargs["k"]
        )
        return similarity.pca_project(
            corpus, comps, id_col=kwargs["id_col"],
            vec_col=kwargs["vec_col"], dim=kwargs["dim"],
        )
    if method == "label_outliers":
        # label-noise triage: bottom-k per label by own-centroid cosine
        return similarity.label_outliers(
            corpus,
            k=kwargs["k"],
            id_col=kwargs["id_col"],
            vec_col=kwargs["vec_col"],
            label_col=conf.get("labelColumn", "label"),
            dim=kwargs["dim"],
        )
    raise StageError(f"SimilaritySearchTransform: unknown method {method!r}")


def text_analysis_transform(ctx: PipelineContext, conf: dict) -> DataFrame:
    """``TextAnalysisTransform``: analysis ∈ language_id | quality |
    token_count | fingerprint | pii_scrub | quality_filter."""
    from sql_based_etl_spark.operators import textops

    df = ctx.view(conf["inputView"])
    text_col = conf.get("textColumn", "text")
    analysis = conf.get("analysis", "quality")
    if analysis == "language_id":
        return textops.language_id(df, text_col)
    if analysis == "quality":
        return textops.quality_features(df, text_col)
    if analysis == "token_count":
        return textops.token_counts(df, text_col)
    if analysis == "fingerprint":
        return textops.fingerprint(df, text_col)
    if analysis == "pii_scrub":
        return textops.pii_scrub(df, text_col, conf.get("idColumn", "doc_id"))
    if analysis == "quality_filter":
        return textops.quality_filter(
            df,
            min_words=int(conf.get("minWords", 30)),
            min_score=float(conf.get("minScore", 0.45)),
            text_col=text_col,
        )
    if analysis == "tfidf":
        return textops.tfidf_topk(
            df,
            id_col=conf.get("idColumn", "doc_id"),
            text_col=text_col,
            k=int(conf.get("topK", 3)),
        )
    raise StageError(f"TextAnalysisTransform: unknown analysis {analysis!r}")


def decontaminate_transform(ctx: PipelineContext, conf: dict) -> DataFrame:
    """``DecontaminateTransform``: flag training docs overlapping the
    benchmark view. method ∈ exact (inverted-index broadcast join,
    per-(doc, bench) shared-gram counts) | bloom (zero-join bitmap
    pre-filter — cheapest corpus-scale shape; confirm hits with exact
    over the flagged subset)."""
    from sql_based_etl_spark.operators import textops

    df = ctx.view(conf["inputView"])
    bench = ctx.view(conf["benchmarkView"])
    id_col = conf.get("idColumn", "doc_id")
    text_col = conf.get("textColumn", "text")
    n = int(conf.get("n", 8))
    min_shared = int(conf.get("minShared", 1))
    method = conf.get("method", "exact")
    if method == "exact":
        max_df = conf.get("maxDf", 1000)
        return textops.decontaminate(
            df, bench, id_col, text_col, n=n, min_shared=min_shared,
            max_df=None if max_df is None else int(max_df),
        )
    if method == "bloom":
        bloom = textops.bloom_build(bench, id_col, text_col, n=n)
        return textops.bloom_decontaminate(
            df, bloom, id_col, text_col, n=n, min_shared=min_shared
        )
    raise StageError(f"DecontaminateTransform: unknown method {method!r}")


def multimodal_transform(ctx: PipelineContext, conf: dict) -> DataFrame:
    """``MultimodalTransform``: operation ∈ attach_binary |
    decode_features | sample_frames."""
    from sql_based_etl_spark.operators import multimodal

    df = ctx.view(conf["inputView"])
    op = conf.get("operation", "attach_binary")
    if op == "attach_binary":
        return multimodal.attach_binary(df, conf.get("textColumn", "text"))
    if op == "decode_features":
        return multimodal.decode_features(
            df, conf.get("idColumn", "doc_id"), conf.get("payloadColumn", "payload")
        )
    if op == "sample_frames":
        return multimodal.sample_frames_stub(
            df,
            frame_bytes=int(conf.get("frameBytes", 256)),
            every_n=int(conf.get("everyN", 4)),
            id_col=conf.get("idColumn", "doc_id"),
            payload_col=conf.get("payloadColumn", "payload"),
        )
    raise StageError(f"MultimodalTransform: unknown operation {op!r}")


def sampling_transform(ctx: PipelineContext, conf: dict) -> DataFrame:
    """``SamplingTransform``: method ∈ hash_split (deterministic named
    splits from ``splits: {name: weight}``) | stratified (exact
    per-stratum fraction) | mixture (epoch-weighted up/down-sampling
    from ``weights: {group: epochs}``). All salted-hash deterministic —
    re-runs and retries assign identically."""
    from sql_based_etl_spark.operators import sampling

    df = ctx.view(conf["inputView"])
    id_col = conf.get("idColumn", "doc_id")
    seed = int(conf.get("seed", 42))
    method = conf.get("method", "hash_split")
    if method == "hash_split":
        splits = conf.get(
            "splits", {"train": 0.98, "val": 0.01, "test": 0.01}
        )
        return sampling.hash_split(
            df, id_col, tuple((k, float(v)) for k, v in splits.items()), seed
        )
    if method == "stratified":
        return sampling.stratified_sample(
            df, conf["strataColumn"], float(conf["fraction"]), id_col, seed
        )
    if method == "mixture":
        return sampling.mixture_sample(
            df,
            {k: float(v) for k, v in conf["weights"].items()},
            group_col=conf.get("groupColumn", "source"),
            id_col=id_col,
            default=float(conf.get("default", 0.0)),
            seed=seed,
        )
    if method == "cap":
        # domain throttling: at most `cap` rows per groupColumn
        return sampling.cap_per_group(
            df, conf.get("groupColumn", "source"), int(conf["cap"]), id_col, seed
        )
    if method == "top_fraction":
        # adaptive per-group thresholding: best ceil(frac*n) per group
        # by a score column (e.g. top 25% by quality per language)
        return sampling.top_fraction_per_group(
            df, conf["groupColumn"], float(conf["fraction"]),
            order_col=conf["orderColumn"], id_col=id_col,
            descending=bool(conf.get("descending", True)),
        )
    if method == "leakage_safe":
        # near-dup-cluster-aware splits: pairs from a prior
        # pair-generating stage via pairsView, else MinHash inline
        from sql_based_etl_spark.operators import dedup as dedup_ops

        pairs = (
            ctx.view(conf["pairsView"])
            if "pairsView" in conf
            else dedup_ops.minhash_lsh_pairs(
                df, id_col, conf.get("textColumn", "text"),
                threshold=float(conf.get("threshold", 0.5)),
            ).select("doc_a", "doc_b")
        )
        splits = conf.get("splits", {"train": 0.98, "val": 0.01, "test": 0.01})
        return sampling.leakage_safe_split(
            df, pairs, id_col=id_col,
            splits=tuple((k, float(v)) for k, v in splits.items()), seed=seed
        )
    raise StageError(f"SamplingTransform: unknown method {method!r}")


def table_profile(ctx: PipelineContext, conf: dict) -> DataFrame:
    """``TableProfile``: one-pass per-column statistics of a view.
    With ``compareView`` (the previous snapshot — e.g. a
    ``DeltaLakeExtract`` at ``relativeVersion: -1``), emits per-column
    DRIFT instead: row growth, null-rate delta, distinct movement,
    range moves — feed into ExpectationsValidate to gate a load."""
    from sql_based_etl_spark.operators.profiling import profile, profile_drift

    if conf.get("analysis") == "outliers":
        from sql_based_etl_spark.operators.profiling import numeric_outlier_stats

        return numeric_outlier_stats(
            ctx.view(conf["inputView"]), conf["groupColumn"],
            conf["valueColumn"], z=float(conf.get("z", 3.0)),
        )
    if conf.get("analysis") == "key_skew":
        from sql_based_etl_spark.operators.profiling import key_skew_stats

        return key_skew_stats(
            ctx.view(conf["inputView"]), conf["keyColumn"],
            top_n=int(conf.get("topN", 10)),
        )
    if "compareView" in conf:
        return profile_drift(
            ctx.view(conf["compareView"]),
            ctx.view(conf["inputView"]),
            columns=conf.get("columns"),
            approx=bool(conf.get("approx", False)),
        )
    return profile(
        ctx.view(conf["inputView"]),
        columns=conf.get("columns"),
        approx=bool(conf.get("approx", False)),
    )

def sketch_transform(ctx: PipelineContext, conf: dict) -> DataFrame:
    """``SketchTransform``: mergeable-sketch construction and use —
    method ∈ kmv (k-min-values cardinality; ``estimate: true`` returns
    the one-row estimate instead of the sketch) | kmv_grouped
    (per-``groupColumn`` sketches) | kmv_overlap (Jaccard/union/
    intersection estimate from two sketch views ``aView``/``bView``) |
    cms (count-min frequency counters) | histogram (fixed-bin counts
    over [lo, hi); with ``quantiles: [..]`` returns interpolated
    quantile estimates instead).

    Sketches are engine-portable (md5-derived hashes) and merge by
    union/addition — build them per shard/day, fold them later without
    rescanning (operators/sketches.py)."""
    from sql_based_etl_spark.operators import sketches

    method = conf.get("method", "kmv")
    col = conf.get("column")
    k = int(conf.get("k", sketches.KMV_K))
    if method == "kmv":
        sk = sketches.kmv_sketch(ctx.view(conf["inputView"]), col, k)
        return sketches.kmv_estimate(sk, k) if conf.get("estimate") else sk
    if method == "kmv_grouped":
        sk = sketches.kmv_sketch_grouped(
            ctx.view(conf["inputView"]), conf["groupColumn"], col, k
        )
        return sketches.kmv_estimate_grouped(sk, k) if conf.get("estimate") else sk
    if method == "cms_estimate":
        # point-frequency estimates for keysView's column against a
        # previously built sketch view (counters broadcast)
        return sketches.cms_estimate(
            ctx.view(conf["sketchView"]), ctx.view(conf["keysView"]), col,
            width=int(conf.get("width", sketches.CMS_WIDTH)),
            depth=int(conf.get("depth", sketches.CMS_DEPTH)),
        )
    if method == "kmv_overlap":
        return sketches.kmv_overlap(
            ctx.view(conf["aView"]), ctx.view(conf["bView"]), k
        )
    if method == "cms":
        return sketches.cms_sketch(
            ctx.view(conf["inputView"]), col,
            width=int(conf.get("width", sketches.CMS_WIDTH)),
            depth=int(conf.get("depth", sketches.CMS_DEPTH)),
        )
    if method == "histogram":
        lo, hi = float(conf["lo"]), float(conf["hi"])
        nbins = int(conf.get("bins", 1000))
        hist = sketches.histogram_sketch(
            ctx.view(conf["inputView"]), col, lo, hi, nbins
        )
        if "quantiles" in conf:
            return sketches.histogram_quantiles(
                hist, [float(q) for q in conf["quantiles"]], lo, hi, nbins
            )
        return hist
    raise StageError(f"SketchTransform: unknown method {method!r}")
