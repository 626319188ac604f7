"""Incrementally-maintained aggregate tables (materialized views) over
versioned source tables, driven by the file-pruned change-data-feed.

The 100 TB pattern this implements: a grouped rollup of a huge fact
table must not be recomputed from scratch every time the fact table
takes an append or a merge. Because sums and counts are abelian-group
aggregates (they have inverses), a CDF delta is enough:

    new_agg = old_agg  ⊕  Σ over changes of sign(change) · row

where sign is +1 for ``insert`` and -1 for ``delete`` rows from
:meth:`VersionedTable.changes`. The refresh therefore reads ONLY the
files the source commit actually touched (the CDF is file-pruned) plus
the existing aggregate table (small by construction) — never the fact
table.

Measures are stored as exact int64 micro-units (``sum_<col>_micros``)
plus a row count ``n``: integer addition is associative and invertible,
so an incremental refresh equals a full recompute EXACTLY, not
approximately — asserted in tests. Groups whose count reaches zero are
dropped. The last-processed source version is recorded in the target
manifest (``source_version``), making refresh idempotent: re-running
against an unchanged source is a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_based_etl_spark.tables.versioned import VersionedTable, VersionedTableError


class IncrementalAggregate:
    """Maintains ``SELECT group_cols, sum(c)·, count(*) FROM source
    GROUP BY group_cols`` as a versioned table at ``target_uri``."""

    def __init__(
        self,
        spark: SparkSession,
        source_uri: str,
        target_uri: str,
        group_cols: list[str],
        sum_cols: list[str],
        num_partitions: int | None = None,
    ):
        self.spark = spark
        self.source = VersionedTable(spark, source_uri)
        self.target = VersionedTable(spark, target_uri)
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)
        self.num_partitions = num_partitions

    def _aggs(self, sign: F.Column | None = None):
        s = sign if sign is not None else F.lit(1).cast("long")
        out = [
            F.sum(s * F.round(F.col(c) * F.lit(1_000_000.0)).cast("long")).alias(
                f"sum_{c}_micros"
            )
            for c in self.sum_cols
        ]
        out.append(F.sum(s).alias("n"))
        return out

    def refresh(self) -> int:
        """Bring the target up to the source's latest version; returns
        the target version written (or the current one on no-op)."""
        if not self.source.exists():
            raise VersionedTableError(f"source table missing: {self.source.path}")
        src_v = self.source.latest_version()

        if not self.target.exists():
            full = self.source.read().groupBy(*self.group_cols).agg(*self._aggs())
            return self.target.write(
                full,
                mode="overwrite",
                num_partitions=self.num_partitions,
                operation="MATERIALIZE",
                extra={"source_version": src_v},
            )

        tgt_v = self.target.latest_version()
        last = self.target.manifest(tgt_v).get("source_version")
        if last is None:
            raise VersionedTableError(
                f"target {self.target.path} was not written by IncrementalAggregate"
            )
        if last == src_v:
            return tgt_v  # idempotent no-op

        sign = F.when(F.col("change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        ).cast("long")
        delta = (
            self.source.changes(from_version=last, to_version=src_v)
            .groupBy(*self.group_cols)
            .agg(*self._aggs(sign))
        )
        merged = (
            self.target.read()
            .unionByName(delta)
            .groupBy(*self.group_cols)
            .agg(
                *[
                    F.sum(f"sum_{c}_micros").alias(f"sum_{c}_micros")
                    for c in self.sum_cols
                ],
                F.sum("n").alias("n"),
            )
            .filter(F.col("n") > 0)
        )
        return self.target.write(
            merged,
            mode="overwrite",
            num_partitions=self.num_partitions,
            operation="INCREMENTAL_REFRESH",
            extra={"source_version": src_v},
        )
