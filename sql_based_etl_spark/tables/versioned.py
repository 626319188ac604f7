"""Parquet + JSON-manifest versioned table: the engine's persistent
storage abstraction.

Provides the Delta-Lake-shaped semantics the reference pipeline relies
on (SURVEY.md §1): ACID-ish overwrite load (scd2-job.ipynb:162-172),
MERGE upsert (scd2-job.ipynb:337-354), and time travel incl. Arc's
``relativeVersion`` (scd2-job.ipynb:461-472) — without external jars
(the sandbox has no delta-spark; the stage API is format-agnostic so a
Delta backend can be swapped in where its jars exist).

Layout::

    <root>/_meta/v{N:08d}.json   one manifest per version
    <root>/data/v{N:08d}/        parquet files for that version

Readers list ``_meta`` and take the highest N — a reader never sees a
half-written version because the manifest is written only after the
data directory is fully committed by Spark. Single-writer semantics
(matching the reference's Argo DAG, scd2-job-scheduler.yaml:47-48:
merges are serialized behind their dependencies).

Scale posture: MERGE is one shuffle join on the merge condition plus a
full snapshot rewrite. At 100 TB a production system prunes rewrite to
matched files (copy-on-write at file granularity); the manifest format
already records per-version file lists so that optimization slots in
without changing the stage API. ``repartitionBeforeWrite`` semantics
(scd2-job-scheduler.yaml:63-64) map to the ``num_partitions`` knob.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class VersionedTableError(RuntimeError):
    pass


def _sql_literal(v: object) -> str:
    """Render a parsed-JSON config value as a SQL expression string."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if v is None:
        return "null"
    if isinstance(v, (int, float)):
        return repr(v)
    return str(v)


class VersionedTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._meta_dir = os.path.join(path, "_meta")

    # --- metadata ---------------------------------------------------------

    def versions(self) -> list[int]:
        if not os.path.isdir(self._meta_dir):
            return []
        out = []
        for fn in os.listdir(self._meta_dir):
            if fn.startswith("v") and fn.endswith(".json"):
                out.append(int(fn[1:-5]))
        return sorted(out)

    def exists(self) -> bool:
        return bool(self.versions())

    def latest_version(self) -> int:
        vs = self.versions()
        if not vs:
            raise VersionedTableError(f"no versions at {self.path}")
        return vs[-1]

    def history(self) -> list[dict]:
        """Per-version metadata, newest first (DeltaTable.history parity)."""
        out = []
        for v in reversed(self.versions()):
            with open(os.path.join(self._meta_dir, f"v{v:08d}.json")) as f:
                out.append(json.load(f))
        return out

    def resolve_version(self, version: int | None = None, relative_version: int | None = None) -> int:
        """Arc's relativeVersion: 0 = latest, -1 = previous, …
        (scd2-job.ipynb:471). Absolute ``version`` wins if given."""
        vs = self.versions()
        if not vs:
            raise VersionedTableError(f"no versions at {self.path}")
        if version is not None:
            if version not in vs:
                raise VersionedTableError(f"version {version} not in {vs}")
            return version
        if relative_version is not None:
            if relative_version > 0:
                raise VersionedTableError("relativeVersion must be <= 0")
            idx = len(vs) - 1 + relative_version
            if idx < 0:
                raise VersionedTableError(
                    f"relativeVersion {relative_version} out of range ({len(vs)} versions)"
                )
            return vs[idx]
        return vs[-1]

    # --- read / write -----------------------------------------------------

    def read(self, version: int | None = None, relative_version: int | None = None) -> DataFrame:
        v = self.resolve_version(version, relative_version)
        return self.spark.read.parquet(os.path.join(self.path, "data", f"v{v:08d}"))

    def write(self, df: DataFrame, mode: str = "overwrite", num_partitions: int | None = None,
              operation: str = "WRITE") -> int:
        """Commit ``df`` as a new version. ``mode='append'`` unions with
        the current snapshot; ``'overwrite'`` replaces it."""
        vs = self.versions()
        if mode == "append" and vs:
            df = self.read().unionByName(df)
        elif mode not in ("overwrite", "append", "errorifexists"):
            raise VersionedTableError(f"unsupported saveMode {mode}")
        if mode == "errorifexists" and vs:
            raise VersionedTableError(f"table exists at {self.path}")
        new_v = (vs[-1] + 1) if vs else 0
        if num_partitions:
            df = df.repartition(num_partitions)
        data_dir = os.path.join(self.path, "data", f"v{new_v:08d}")
        df.write.mode("errorifexists").parquet(data_dir)
        os.makedirs(self._meta_dir, exist_ok=True)
        manifest = {
            "version": new_v,
            "operation": operation,
            "timestamp": time.time(),
            "data_dir": f"data/v{new_v:08d}",
            "schema": df.schema.jsonValue(),
        }
        tmp = os.path.join(self._meta_dir, f".v{new_v:08d}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, os.path.join(self._meta_dir, f"v{new_v:08d}.json"))
        return new_v

    # --- merge (the SCD2 workhorse) ----------------------------------------

    def merge(
        self,
        source: DataFrame,
        condition: str,
        when_matched_update: dict[str, object] | None = None,
        matched_condition: str | None = None,
        insert_not_matched: bool = True,
        num_partitions: int | None = None,
        validate_unique_match: bool = True,
    ) -> int:
        """Delta-style ``MERGE INTO`` (DeltaLakeMergeLoad parity,
        scd2-job.ipynb:337-354).

        ``condition`` / ``matched_condition`` / update values are SQL
        expressions over ``source.*`` and ``target.*`` aliases — exactly
        the reference's config surface (condition at :344, matched
        update at :345-350, not-matched insert at :353). NULL merge keys
        on the source route rows to the insert branch via standard SQL
        null semantics (scd2-job.ipynb:298,309) — no special code.

        Physical shape: one full-outer shuffle join target⋈source on the
        condition, branch classification with ``when()``, snapshot write.
        Update expressions see both aliases; inserted rows take the
        source columns positionally mapped onto the target schema.
        """
        target = self.read()
        t_cols = target.columns
        t = target.alias("target").withColumn("__t", F.lit(1))
        s = source.alias("source").withColumn("__s", F.lit(1))
        joined = t.join(s, F.expr(condition), "full_outer")

        if validate_unique_match:
            # Delta always errors when one target row matches several source
            # rows (the update would be ambiguous) — fail-loud by default to
            # match that; opt out only when the extra job is provably wasted.
            key = [F.col(f"target.{c}") for c in t_cols]
            dup = (
                joined.filter(F.col("__t").isNotNull() & F.col("__s").isNotNull())
                .groupBy(*key)
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
                .count()
            )
            if dup:
                raise VersionedTableError(
                    "merge: multiple source rows match a single target row"
                )

        matched = F.col("__t").isNotNull() & F.col("__s").isNotNull()
        update_gate = matched & (
            F.expr(matched_condition) if matched_condition else F.lit(True)
        )

        out_cols = []
        # Config values arrive as parsed JSON — `"iscurrent": false` is a
        # Python bool (scd2-job.ipynb:349) — so render non-strings as SQL
        # literals before F.expr ever sees them.
        upd = {k: _sql_literal(v) for k, v in (when_matched_update or {}).items()}
        t_dtypes = dict(target.dtypes)
        for c in t_cols:
            # Delta coerces update/insert expressions to the target column
            # type (the reference relies on this: boolean `false` lands in
            # the integer `iscurrent` column, scd2-job.ipynb:144,349) —
            # cast each branch to the target dtype.
            dtype = t_dtypes[c]
            keep = F.col(f"target.{c}")
            if c in upd:
                updated = F.when(update_gate, F.expr(upd[c]).cast(dtype)).otherwise(keep)
            else:
                updated = keep
            # source-only rows → insert branch: map source columns by name,
            # falling back to NULL for target-only columns.
            if insert_not_matched and c in source.columns:
                ins = F.col(f"source.{c}").cast(dtype)
            else:
                ins = F.lit(None).cast(dtype)
            out_cols.append(
                F.when(F.col("__t").isNotNull(), updated).otherwise(ins).alias(c)
            )

        result = joined
        if not insert_not_matched:
            result = result.filter(F.col("__t").isNotNull())
        result = result.select(*out_cols)
        return self.write(result, mode="overwrite", num_partitions=num_partitions,
                          operation="MERGE")
