"""Streaming near-duplicate detection: MinHash-LSH against a
versioned-table index maintained across micro-batches.

The batch operators already cover one-shot
(``operators/dedup.py:minhash_lsh_pairs``) and daily-incremental
(``minhash_lsh_pairs_incremental``) near-dup; this module closes the
third arrival mode — a continuous document stream — by running the
incremental operator inside ``foreachBatch`` with the historical state
held in the engine's own versioned tables:

* ``<index>/hashed`` — the corpus ``(id, h)`` hashed-shingle relation
  (feeds the Jaccard verify);
* ``<index>/bands``  — its banded LSH bucket keys (probed by each
  batch without touching old text);
* ``<index>/flags``  — the per-document verdicts, one APPEND version
  per micro-batch.

Semantics: a document is flagged ``is_dup`` when it near-dups (Jaccard
≥ threshold through the LSH blocking) anything ALREADY in the index or
a smaller-id document of its own batch; both members of a duplicate
pair are still ingested into the index (flag-and-route, not drop — the
policy choice stays downstream, and it makes the flagged set
order-insensitive within a batch). old×old is never re-paired: each
pair's cost is paid exactly once, when its later member arrives.

Exactly-once: all three writes go through
``streaming/events.py:append_stream_batch``, which records the
micro-batch id in each table's manifest and skips replayed batches
per-table. A crash between the three commits self-heals on replay —
already-committed tables skip, the missing ones commit (each table's
append is individually idempotent and their contents are functions of
the same immutable batch).

Scale shape (100 TB corpus, streaming arrivals): per batch the work is
|batch| shingling + a postings probe of ONLY the buckets the batch
touches + a verify semi-joined to candidates — never a rescan of the
stored corpus. The index tables grow file-additively (no rewrites);
compaction is the versioned table's existing ``compact()`` maintenance
op. Bucket-hotness is re-evaluated per batch over probed buckets, so a
bucket that grows hot over the stream's life starts being skipped
exactly when it crosses ``max_bucket``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sql_based_etl_spark.operators.dedup import (
    hashed_shingle_rows,
    minhash_bands_from_hashes,
    minhash_lsh_pairs_incremental,
)
from sql_based_etl_spark.streaming.events import append_stream_batch
from sql_based_etl_spark.tables.versioned import VersionedTable


def near_dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    n: int = 3,
    max_bucket: int = 1000,
) -> None:
    """One micro-batch of streaming near-dedup (module-level so the
    replay/restart contract is directly testable, mirroring
    ``append_stream_batch``)."""
    spark = batch_df.sparkSession
    # No lineage detach: an eager localCheckpoint here (the round-3
    # workaround for AQE-less IncrementalExecution planning, then
    # measured 10× wall-clock without it) is wall-clock-NEUTRAL on
    # PySpark 4.1 (A/B min-of-series 32.6s vs 32.9s at sf0.1 — see
    # PLANS.md round-8 reading), and on a real cluster it would pin
    # every micro-batch's partitions in executor storage and trade
    # lineage-based recovery for executor-loss fragility. Deleted.
    if batch_df.isEmpty():
        return
    new_hashed = hashed_shingle_rows(batch_df, id_col, text_col, n).persist()
    new_bands = minhash_bands_from_hashes(new_hashed)

    hashed_t = VersionedTable(spark, os.path.join(index_dir, "hashed"))
    bands_t = VersionedTable(spark, os.path.join(index_dir, "bands"))
    empty = F.lit(False)
    if hashed_t.exists():
        old_hashed = hashed_t.read()
        old_bands = bands_t.read()
    else:
        old_hashed = spark.createDataFrame([], new_hashed.schema)
        old_bands = spark.createDataFrame([], new_bands.schema)

    pairs = minhash_lsh_pairs_incremental(
        batch_df, old_hashed, old_bands, id_col, text_col,
        threshold, max_bucket, n, new_hashed=new_hashed,
    ).persist()  # consumed by both endpoint projections below
    # endpoint view of the pair list: a batch doc is a duplicate when
    # its partner is historical (not in this batch) or a smaller-id
    # batchmate — the keep-first policy, arrival-order-free
    ends = pairs.select(
        F.col("doc_a").alias("pid"), F.col("doc_b").alias("other")
    ).unionAll(
        pairs.select(F.col("doc_b").alias("pid"), F.col("doc_a").alias("other"))
    )
    batch_members = batch_df.select(
        F.col(id_col).alias("other"), F.lit(True).alias("__in_batch")
    )
    dup_ids = (
        ends.join(batch_df.select(F.col(id_col).alias("pid")), "pid", "leftsemi")
        .join(batch_members, "other", "left")
        .filter(F.col("__in_batch").isNull() | (F.col("other") < F.col("pid")))
        .select("pid")
        .distinct()
        .withColumnRenamed("pid", id_col)
        .withColumn("__dup", F.lit(True))
    )
    flags = batch_df.select(id_col).join(dup_ids, id_col, "left").select(
        F.col(id_col), F.coalesce(F.col("__dup"), empty).alias("is_dup")
    )

    # flags first: on crash+replay each table skips or commits
    # individually (idempotent per batch), so partial failures self-heal
    append_stream_batch(flags, batch_id, os.path.join(index_dir, "flags"))
    append_stream_batch(new_hashed, batch_id, os.path.join(index_dir, "hashed"))
    append_stream_batch(new_bands, batch_id, os.path.join(index_dir, "bands"))
    new_hashed.unpersist()
    pairs.unpersist()


def stream_near_dedup(
    docs_stream: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    n: int = 3,
    max_bucket: int = 1000,
    checkpoint: str | None = None,
):
    """Start the streaming near-dedup query over a document stream;
    returns the started ``StreamingQuery`` (caller awaits/stops). Read
    verdicts from ``<index_dir>/flags`` (one APPEND version per
    micro-batch; time-travelable like any versioned table)."""
    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        near_dedup_batch(
            batch_df, batch_id, index_dir, id_col, text_col,
            threshold, n, max_bucket,
        )

    writer = docs_stream.writeStream.foreachBatch(_sink).outputMode("append")
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
