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
    <root>/data/v{N:08d}/        parquet files written by that version

A manifest lists the **files** composing its snapshot — copy-on-write
at file granularity, like Delta/Iceberg: a version may reference files
written by earlier versions. Readers list ``_meta`` and take the
highest N; a reader never sees a half-written version because the
manifest is published atomically (full temp write + no-overwrite
rename on rename-capable stores; one conditional PUT on object stores,
where the object materializes whole at close) and only after the data
files are fully written. Blind APPENDS get optimistic concurrency
(round 10) — the claim loser re-bases on the winner's snapshot and
retries at the next version, staging into per-writer unique data dirs
so racers never collide before the manifest claim, and the
exactly-once stream sink detects a racing duplicate of the SAME
micro-batch by its recorded stream_batch_id. MERGE and COMPACT races
are CLASSIFIED like the Delta bridge's (round 11,
:meth:`VersionedTable._classify_winner`): a COMPACT racing a blind
append rebases and retries (the hourly-append + nightly-OPTIMIZE
shape), while winners that evolved the schema or touched the loser's
read/removed files raise the named VersionedConcurrent*Error instead
of a raw lost-race error. OVERWRITE and RESTORE remain single-winner
(they replace the snapshot wholesale — matching the reference's Argo
DAG, scd2-job-scheduler.yaml:47-48, which serializes them behind
their dependencies).

All metadata I/O goes through the Hadoop FileSystem API (via the JVM
gateway), so a table can live on any Hadoop-supported filesystem —
``file://`` locally, ``hdfs://``/``s3a://`` on a cluster (the
reference's tables are on S3, scd2-job.ipynb:42,167). Manifest commit
goes through :func:`publish_text_exclusive`: two writers racing to the
same version number get optimistic-concurrency semantics on EVERY FS
type — the loser's commit raises instead of silently overwriting
(pytest-pinned), including object stores, where the create maps to a
conditional PUT on Hadoop ≥ 3.4.1 S3A.

Scale posture: MERGE joins the source against only the target files
that contain matching rows (detected with one semi-join over
``input_file_name()``) and rewrites only those; untouched files are
carried forward by reference. APPEND writes only the new files. The
``repartitionBeforeWrite`` knob (scd2-job-scheduler.yaml:63-64) maps
to ``num_partitions``.

Data skipping (Delta/Iceberg-style): every commit records per-file
min/max/null-count stats for scalar columns in the manifest, and
:meth:`read` takes simple conjunctive ``filters`` that prune
non-matching files **driver-side, from metadata alone** — a selective
scan over a 100 TB table opens only the files whose stat range
intersects the predicate, before Spark plans anything. Writes accept
``cluster_by`` (range-partition + sort, the liquid-clustering
analogue) so file stat ranges are narrow and pruning actually bites.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class VersionedTableError(RuntimeError):
    pass


class CommitRaceLostError(VersionedTableError):
    """Raised by :func:`publish_text_exclusive` when another writer
    published the same entry first. Distinct from the base class so an
    optimistic-concurrency layer (the Delta bridge's commit retry, and
    VersionedTable's own append retry) can catch exactly the lost race
    — never an IO failure or a protocol violation — and re-attempt at
    the next version after conflict analysis."""


class ConcurrentStreamBatchError(VersionedTableError):
    """An append retry found the SAME ``stream_batch_id`` already
    committed by a racing writer: two instances of one exactly-once
    sink raced the same micro-batch. The payload is in the table once;
    the caller (``append_stream_batch``) treats this as
    already-committed rather than double-appending."""


# Round-11: the native format's named conflict family — the manifest
# analogue of the Delta bridge's DeltaConcurrentModificationError
# classification (delta_interop.py:_check_commit_conflict). A winner's
# footprint is its manifest diff against its predecessor (added =
# win - prev, removed = prev - win); the loser declares what it read
# and removed, and commuting winners are retried past instead of
# raising a raw CommitRaceLostError.
class VersionedConcurrentModificationError(VersionedTableError):
    """A native-format commit raced a winner whose changes cannot be
    proven disjoint from this operation."""


class VersionedSchemaChangedError(VersionedConcurrentModificationError):
    pass


class VersionedConcurrentAppendError(VersionedConcurrentModificationError):
    pass


class VersionedConcurrentDeleteReadError(VersionedConcurrentModificationError):
    pass


class VersionedConcurrentDeleteDeleteError(VersionedConcurrentModificationError):
    pass


# Object stores where rename is a non-atomic copy+delete but a created
# object is invisible until close (one atomic PUT) — there the
# conditional create of the final object is both the arbiter and the
# atomic publish. Everywhere else (file/hdfs/abfs/viewfs/...) rename is
# atomic and FileContext.rename(Rename.NONE) is put-if-absent.
_OBJECT_STORE_SCHEMES = {"s3", "s3a", "s3n", "gs", "oss", "cos", "cosn", "obs", "wasb", "wasbs"}
_STALE_TEMP_SECONDS = 3600.0


def _is_already_exists(e: Exception) -> bool:
    jcls = ""
    if hasattr(e, "java_exception"):
        try:
            jcls = e.java_exception.getClass().getName()
        except Exception:
            jcls = ""
    return "AlreadyExists" in jcls or "already exists" in str(e).lower()


def publish_text_exclusive(spark: SparkSession, dir_path: str, name: str,
                           data: str, *, what: str = "manifest") -> None:
    """Publish ``data`` at ``<dir_path>/<name>`` with BOTH at-most-once
    arbitration (two writers racing the same name: exactly one wins, the
    loser RAISES — never last-writer-wins) and atomic visibility (a
    reader that can list the final name can parse it in full — never a
    truncated entry).

    Route 1 — rename-capable stores (``file://``, ``hdfs://``, ABFS,
    viewfs; anything with an ``AbstractFileSystem`` binding that is not
    a copy+delete object store): write the full payload to a
    dot-prefixed temp in the same directory (invisible to version
    listings, which match ``v*.json`` / ``%020d.json``), close it, then
    publish via ``FileContext.rename(src, dst, Options.Rename.NONE)`` —
    the reference Delta ``HDFSLogStore`` pattern. On HDFS the
    no-overwrite rename is arbitrated at the namenode (exact
    put-if-absent); on the local FS it is an existence check followed
    by an atomic ``rename(2)`` (a microsecond code window, vs. the
    unbounded pause window the old staleness-reclaim protocol carried —
    and with NO reclaim rule here, nothing ever deletes a live writer's
    in-flight file, so the wake-up-and-clobber hole cannot reopen).
    Readers can never observe a partial final file because the final
    name only ever appears via rename of a fully-written, closed temp.
    A crash at ANY point leaves at worst an orphan dot-temp — never a
    truncated final entry, never a bricked version; orphans are swept
    opportunistically after ``_STALE_TEMP_SECONDS`` by later commits.

    Route 2 — object stores (and schemes with no ``FileContext``
    binding): ONE conditional create of the final object itself (S3A
    maps it to ``If-None-Match`` conditional PUT on Hadoop ≥ 3.4.1;
    older S3A does HEAD-then-PUT — front with a lock service there, the
    pre-conditional-put Delta-on-S3 pattern). Visibility is already
    atomic there — the object materializes fully-formed at close; a
    crash mid-write uploads nothing. A non-crash write/close failure
    deletes the final object before re-raising, so a transient IO error
    cannot leave a truncated entry behind.

    Net: on every supported store, a listed final entry is a complete
    entry, and the loser of a version race raises at publish time."""
    import uuid

    jvm = spark.sparkContext._jvm  # noqa: SLF001
    conf = spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
    jdir = jvm.org.apache.hadoop.fs.Path(dir_path)
    fs = jdir.getFileSystem(conf)
    fs.mkdirs(jdir)
    final = jvm.org.apache.hadoop.fs.Path(f"{dir_path}/{name}")
    scheme = (fs.getUri().getScheme() or "file").lower()
    payload = bytearray(data.encode("utf-8"))

    fc = None
    if scheme not in _OBJECT_STORE_SCHEMES:
        try:
            fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri(), conf)
        except Exception:
            fc = None  # no AbstractFileSystem binding — fall through to route 2

    if fc is None:
        # Route 2: conditional create of the final object.
        try:
            out = fs.create(final, False)  # put-if-absent: loser raises
        except Exception as e:  # Py4J-wrapped java.io exceptions
            if _is_already_exists(e):
                raise CommitRaceLostError(
                    f"concurrent commit detected for {what} {name} at "
                    f"{dir_path}: the entry already exists"
                ) from None
            raise
        try:
            try:
                out.write(payload)
            finally:
                out.close()
        except Exception:
            # ADVICE r6: a transient IO failure must not leave a
            # truncated final entry that bricks the version — remove it
            # before surfacing the error (on S3A nothing was uploaded;
            # the delete is a no-op there).
            try:
                fs.delete(final, False)
            except Exception:
                pass
            raise
        return

    # Route 1: full temp write, then no-overwrite rename publish.
    tmp = jvm.org.apache.hadoop.fs.Path(
        f"{dir_path}/.{name}.{uuid.uuid4().hex}.tmp")
    out = fs.create(tmp, True)
    try:
        try:
            out.write(payload)
        finally:
            out.close()
    except Exception:
        try:
            fs.delete(tmp, False)
        except Exception:
            pass
        raise
    gw = spark.sparkContext._gateway  # noqa: SLF001
    rename_enum = jvm.org.apache.hadoop.fs.Options.Rename
    opts = gw.new_array(rename_enum, 1)
    opts[0] = rename_enum.NONE
    try:
        fc.rename(tmp, final, opts)
    except Exception as e:
        try:
            fs.delete(tmp, False)
        except Exception:
            pass
        if _is_already_exists(e):
            raise CommitRaceLostError(
                f"concurrent commit detected for {what} {name} at "
                f"{dir_path}: the entry already exists"
            ) from None
        raise
    _sweep_stale_temps(fs, jdir)


def _sweep_stale_temps(fs, jdir) -> None:
    """Best-effort reclamation of crashed writers' orphan dot-temps.

    Only files matching the publish temp shape (``.<name>.<hex>.tmp``)
    and older than ``_STALE_TEMP_SECONDS`` are touched — a LIVE writer's
    temp is at most seconds old (one buffered write of a small JSON
    payload), so unlike the removed claim-reclaim protocol this can
    never delete an entry another writer is about to publish: the temp
    is private to its writer (uuid-suffixed) and deleting it after the
    rename has happened is a no-op on the published final file."""
    try:
        cutoff_ms = (time.time() - _STALE_TEMP_SECONDS) * 1000.0
        for st in fs.listStatus(jdir):
            n = st.getPath().getName()
            if (n.startswith(".") and n.endswith(".tmp")
                    and st.getModificationTime() < cutoff_ms):
                try:
                    fs.delete(st.getPath(), False)
                except Exception:
                    pass
    except Exception:
        pass


def parse_timestamp_cutoff(timestamp: float | str) -> float:
    """``timestampAsOf`` argument → epoch seconds. Accepts epoch
    seconds (number or string — notebook variable substitution is
    string-typed, so ``'1700000000.5'`` is the common arrival shape) or
    an ISO ``'YYYY-MM-DD[ HH:MM:SS]'`` string (naive = UTC). Shared by
    the versioned table and the Delta-bridge reader so both time-travel
    surfaces parse identically."""
    if isinstance(timestamp, str):
        import datetime as _dt

        try:
            return float(timestamp)
        except ValueError:
            pass
        try:
            ts = _dt.datetime.fromisoformat(timestamp)
        except ValueError as e:
            raise VersionedTableError(
                f"timestampAsOf {timestamp!r} is neither epoch seconds "
                "nor an ISO 'YYYY-MM-DD[ HH:MM:SS]' string"
            ) from e
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        return ts.timestamp()
    return float(timestamp)


def _sql_literal(v: object) -> str:
    """Render a parsed-JSON config value as a SQL expression string."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if v is None:
        return "null"
    if isinstance(v, (int, float)):
        return repr(v)
    return str(v)


# Column types that get per-file min/max stats. Arrays/maps/structs/
# binary are excluded: range stats are meaningless or huge for them.
_STATS_TYPES = (
    "byte", "short", "int", "bigint", "float", "double",
    "string", "date", "timestamp", "timestamp_ntz", "boolean",
)


def _stat_encode(v: object) -> object:
    """JSON-encode a stat bound so that Python-comparing two encoded
    values matches SQL ordering: numbers stay numbers, timestamps/dates
    become ISO strings (space separator — lexicographic order is
    chronological for a fixed format with no trailing fraction zeros)."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


_FILTER_OPS = ("=", "<", "<=", ">", ">=", "in")


def _manifest_tree_may_match(fstats: dict | None, tree) -> bool:
    """Scope-tree evaluation over one file's manifest stats
    (``{rows, columns: {col: {min, max, nulls}}}``) — the native
    table's lane of the shared subset-lattice analysis (see
    engine/sql_compat.py:eval_scope_tree): False only when the
    reduced predicate provably excludes every row of the file.
    Missing stats / columns keep the file."""
    from sql_based_etl_spark.engine.sql_compat import (
        KLEENE_ANY,
        eval_scope_tree,
        stats_value_set,
    )

    if fstats is not None and fstats.get("rows") == 0:
        return False  # a zero-row file matches nothing
    cols = (fstats or {}).get("columns") or {}
    num = (fstats or {}).get("rows")

    def _atom(c: str, op: str, lit) -> frozenset:
        cs = cols.get(c)
        if cs is None:
            return KLEENE_ANY
        if op not in ("is null", "is not null"):
            lit = ([_stat_encode(x) for x in lit] if op == "in"
                   else _stat_encode(lit))
        return stats_value_set(op, lit, cs.get("min"), cs.get("max"),
                               cs.get("nulls"), num)

    return eval_scope_tree(tree, _atom)


def _file_may_match(col_stats: dict | None, op: str, val: object) -> bool:
    """Conservative driver-side prune test for one conjunct against one
    file's stats. True = the file might contain matching rows (keep);
    stats absent ⇒ keep. All supported ops are null-rejecting, so a
    file whose column is entirely NULL (min is null) is safely pruned."""
    if op not in _FILTER_OPS:
        raise VersionedTableError(f"unsupported filter op {op!r}; use one of {_FILTER_OPS}")
    if col_stats is None:
        return True
    lo, hi = col_stats.get("min"), col_stats.get("max")
    if lo is None or hi is None:
        return False  # no non-null values in this file
    vals = [_stat_encode(v) for v in (val if op == "in" else [val])]
    try:
        if op == "=" or op == "in":
            return any(lo <= v <= hi for v in vals)
        if op == "<":
            return lo < vals[0]
        if op == "<=":
            return lo <= vals[0]
        if op == ">":
            return hi > vals[0]
        return hi >= vals[0]  # >=
    except TypeError:
        return True  # incomparable literal type — never prune on it


def build_merge_annotated(
    subset: DataFrame,
    source: DataFrame,
    condition: str,
    when_matched_update: dict[str, object] | None = None,
    matched_condition: str | None = None,
    insert_not_matched: bool = True,
    validate_unique_match: bool = True,
    when_matched_delete: str | None = None,
    when_not_matched_by_source_delete: str | None = None,
) -> DataFrame:
    """The engine-agnostic MERGE core, shared by
    :meth:`VersionedTable.merge` and the Delta bridge's
    :func:`~sql_based_etl_spark.tables.delta_interop.merge_delta` —
    both stores prune to the matched files first and hand ONLY that
    subset here, so one implementation carries the reference's update /
    insert semantics (scd2-job.ipynb:337-354) for every target format.

    ``subset`` is the matched slice of the target (full target schema);
    ``condition`` must already be Spark-4-coerced by the caller (it also
    drives the caller's matched-file semi-join, so coercion lives
    there). Returns one row per output row of the rewritten slice —
    kept / updated target rows plus (when ``insert_not_matched``)
    unmatched source rows — with, for every target column ``c``:

    - ``c``: the POST-merge value (update / insert branch applied,
      cast to the target dtype — Delta coerces update and insert
      expressions to the target column type, and the reference relies
      on it: boolean ``false`` lands in the integer ``iscurrent``
      column, scd2-job.ipynb:144,349);
    - ``__pre_<c>``: the PRE-merge target value (NULL on insert rows) —
      what a CDF writer needs for ``update_preimage`` rows;

    plus boolean markers ``__updated`` (matched AND the matched
    condition held AND there are update expressions), ``__inserted``
    (source row with no target match), and ``__deleted``. Callers take
    the data rows with ``.filter(~F.col("__deleted")).select(t_cols)``;
    CDF-emitting callers derive change rows from the markers without
    re-running the join.

    Delete clauses (the CDC-apply idiom, delta-spark's MERGE surface):

    - ``when_matched_delete``: SQL condition (``"true"`` for
      unconditional) — matched rows satisfying it are DELETED.
      Evaluated BEFORE the update clause, the op='D'-first CDC shape:
      a row captured by the delete condition never reaches the update
      branch.
    - ``when_not_matched_by_source_delete``: SQL condition over
      ``target.*`` — target rows with NO source match satisfying it
      are deleted (reconciliation deletes). NOTE for file-pruning
      callers: this clause inspects every target row, so the matched-
      file prune must widen to ALL files when it is present — the same
      full-table cost delta-spark pays for this clause."""
    from sql_based_etl_spark.engine.sql_compat import (  # circular-free
        coerce_condition_for_types,
    )

    t_cols = subset.columns
    t_dtypes = dict(subset.dtypes)
    dtmap = {"target": t_dtypes, "source": dict(source.dtypes)}
    if matched_condition:
        matched_condition = coerce_condition_for_types(matched_condition, dtmap)
    if when_matched_delete:
        when_matched_delete = coerce_condition_for_types(
            when_matched_delete, dtmap)
    if when_not_matched_by_source_delete:
        when_not_matched_by_source_delete = coerce_condition_for_types(
            when_not_matched_by_source_delete, dtmap)

    t = subset.alias("target").withColumn("__t", F.lit(1))
    s = source.alias("source").withColumn("__s", F.lit(1))
    joined = t.join(s, F.expr(condition), "full_outer")

    if validate_unique_match:
        # Delta always errors when one target row matches several source
        # rows (the update would be ambiguous) — fail-loud by default to
        # match that; opt out only when the extra job is provably wasted.
        # The match count is keyed on a surrogate per-row id, not the
        # row's columns: a single long shuffles instead of the whole
        # row, unorderable column types (variant) stay mergeable, and
        # two IDENTICAL target rows each matching one source row no
        # longer collapse into a false ambiguity. The id only needs to
        # be stable within this one counting action, which
        # monotonically_increasing_id is.
        tt = (subset.withColumn("__merge_rid",
                                F.monotonically_increasing_id())
              .alias("target"))
        dup = (
            tt.join(source.alias("source"), F.expr(condition), "inner")
            .groupBy("__merge_rid")
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
    delete_gate = F.lit(False)
    if when_matched_delete:
        delete_gate = F.coalesce(
            matched & F.expr(when_matched_delete), F.lit(False))
    if when_not_matched_by_source_delete:
        by_source_gate = F.coalesce(
            F.col("__t").isNotNull() & F.col("__s").isNull()
            & F.expr(when_not_matched_by_source_delete), F.lit(False))
        delete_gate = delete_gate | by_source_gate
    update_gate = matched & ~delete_gate & (
        F.expr(matched_condition) if matched_condition else F.lit(True)
    )

    # Config values arrive as parsed JSON — `"iscurrent": false` is a
    # Python bool (scd2-job.ipynb:349) — so render non-strings as SQL
    # literals before F.expr ever sees them.
    upd = {k: _sql_literal(v) for k, v in (when_matched_update or {}).items()}
    out_cols, pre_cols = [], []
    for c in t_cols:
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
        pre_cols.append(keep.alias(f"__pre_{c}"))

    result = joined
    if not insert_not_matched:
        result = result.filter(F.col("__t").isNotNull())
    return result.select(
        *out_cols,
        *pre_cols,
        # a matched row whose matched_condition evaluates NULL keeps its
        # old values (SQL WHEN semantics) — the marker must say False,
        # not NULL, so CDF derivation filters stay two-valued
        F.coalesce(update_gate & F.lit(bool(upd)), F.lit(False)).alias("__updated"),
        F.col("__t").isNull().alias("__inserted"),
        delete_gate.alias("__deleted"),
    )


def zorder_key(df: DataFrame, cols: list[str],
               bits: int = 16) -> tuple[DataFrame, str]:
    """Append an interleaved-bit Z-order key column over ``cols``
    (shared by :meth:`VersionedTable.write`'s clustered rewrites and
    the Delta bridge's OPTIMIZE ZORDER).

    Each column is min-max scaled to a ``bits``-bit code (one 1-row
    aggregate, broadcast — no sort, no window; skewed distributions
    get uneven codes but pruning stays correct, just less selective —
    rank-based codes would need a global sort), then the codes' bits
    interleave LSB-first. Clustering on the key gives every clustered
    column a ~|range|^(1/k) per-file span, so data skipping works on
    ANY of them, not only the leading one as in lexicographic range
    clustering. Numeric and timestamp columns only."""
    from pyspark.sql.types import NumericType, TimestampNTZType, TimestampType

    types = {f.name: f.dataType for f in df.schema.fields}
    nums = []
    for c in cols:
        t = types[c]
        if isinstance(t, (TimestampType, TimestampNTZType)):
            nums.append(F.unix_micros(F.col(c).cast("timestamp")).cast("double"))
        elif isinstance(t, NumericType):
            nums.append(F.col(c).cast("double"))
        else:
            raise VersionedTableError(
                f"zorder clustering needs numeric/timestamp columns; "
                f"{c!r} is {t.simpleString()}"
            )
    bounds = df.agg(*[
        a for i, num in enumerate(nums)
        for a in (F.min(num).alias(f"__zmn_{i}"), F.max(num).alias(f"__zmx_{i}"))
    ])
    df = df.crossJoin(F.broadcast(bounds))
    top = (1 << bits) - 1
    codes = []
    for i, num in enumerate(nums):
        rng = F.col(f"__zmx_{i}") - F.col(f"__zmn_{i}")
        code = F.when(
            (rng <= 0) | rng.isNull() | num.isNull(), F.lit(0)
        ).otherwise(
            F.floor((num - F.col(f"__zmn_{i}")) / rng * F.lit(float(top)))
        ).cast("long")
        codes.append(code)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, code in enumerate(codes):
            bit = F.shiftright(code, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(codes) + i))
    df = df.withColumn("__zkey", z)
    return df.drop(*[c for c in df.columns
                     if c.startswith("__zmn_") or c.startswith("__zmx_")]), "__zkey"


# session-id → fs.defaultFS (one py4j fetch per session; see
# VersionedTable._local_root)
_DEFAULT_FS_CACHE: dict[int, str] = {}


class VersionedTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")

    # --- Hadoop FS plumbing -----------------------------------------------

    def _jpath(self, *parts: str):
        jvm = self.spark.sparkContext._jvm  # noqa: SLF001
        return jvm.org.apache.hadoop.fs.Path("/".join((self.path, *parts)))

    def _local_root(self) -> str | None:
        """OS path of the table when it provably lives on the LOCAL
        filesystem (explicit ``file:`` URI, or a bare path under a
        ``file:`` defaultFS) — else None.

        Metadata READS (version listing, manifest fetch) then go
        through plain ``os``/``open`` instead of the Hadoop FS object
        via py4j: a merge makes dozens of such calls and each py4j
        Path/FileSystem round trip costs ~1-3 ms of driver latency
        (~0.5s per q_scd2_merge run, measured r13). On HDFS/object
        stores this returns None and the Hadoop path is used
        unchanged; WRITES always use the Hadoop path (the atomic
        publish protocol lives there)."""
        p = self.path
        if p.startswith("file:"):
            from urllib.parse import urlparse

            u = urlparse(p)
            # a non-empty authority (file://host/…) names a REMOTE
            # host: stripping it would silently read the wrong local
            # path (versions() returning [] for an existing table) —
            # keep the Hadoop path for anything but the local host
            if u.netloc not in ("", "localhost"):
                return None
            return u.path or "/"
        head = p.split("/", 1)[0]
        if "://" in p or ":" in head:
            return None  # non-file scheme
        # bare path: local only when the default filesystem is file:
        key = id(self.spark)
        default = _DEFAULT_FS_CACHE.get(key)
        if default is None:
            default = (
                self.spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
                .get("fs.defaultFS", "file:///")
            )
            _DEFAULT_FS_CACHE[key] = default
        return p if default.startswith("file:") else None

    def _fs(self):
        conf = self.spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
        return self._jpath("_meta").getFileSystem(conf)

    def _read_text(self, jpath) -> str:
        jvm = self.spark.sparkContext._jvm  # noqa: SLF001
        stream = self._fs().open(jpath)
        try:
            return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        finally:
            stream.close()

    def _write_text_atomic(self, name: str, data: str) -> None:
        """Commit ``_meta/<name>`` via :func:`publish_text_exclusive`:
        full temp write + ``FileContext.rename(Rename.NONE)`` publish on
        rename-capable stores (atomic visibility — a reader never sees a
        half-written manifest — AND put-if-absent arbitration), ONE
        conditional create of the final object on object stores (where a
        PUT is already atomic at close). The loser of a version race
        raises on every store; a crash at any point leaves at worst an
        invisible orphan dot-temp, never a truncated manifest."""
        publish_text_exclusive(self.spark, f"{self.path}/_meta", name, data,
                               what="manifest")

    # --- metadata ---------------------------------------------------------

    def versions(self) -> list[int]:
        local = self._local_root()
        if local is not None:
            try:
                names = os.listdir(os.path.join(local, "_meta"))
            except (FileNotFoundError, NotADirectoryError):
                return []
            return sorted(
                int(fn[1:-5]) for fn in names
                if fn.startswith("v") and fn.endswith(".json")
            )
        fs = self._fs()
        meta = self._jpath("_meta")
        if not fs.exists(meta):
            return []
        out = []
        for st in fs.listStatus(meta):
            fn = st.getPath().getName()
            if fn.startswith("v") and fn.endswith(".json"):
                out.append(int(fn[1:-5]))
        return sorted(out)

    def exists(self) -> bool:
        return bool(self.versions())

    def manifest(self, version: int) -> dict:
        name = f"v{version:08d}.json"
        local = self._local_root()
        if local is not None:
            with open(os.path.join(local, "_meta", name), encoding="utf-8") as fh:
                txt = fh.read()
        else:
            txt = self._read_text(self._jpath("_meta", name))
        try:
            return json.loads(txt)
        except ValueError as e:
            # The publish protocol makes a listed-but-truncated manifest
            # impossible on every supported store (see
            # publish_text_exclusive), so this is external corruption or
            # a foreign writer's crash remnant. Name the file and the
            # remediation instead of a bare JSONDecodeError.
            raise VersionedTableError(
                f"unparsable manifest {self.path}/_meta/{name}: {e}. "
                "Manifests are published atomically, so this file was "
                "corrupted externally or written by a non-atomic foreign "
                "writer; if it is the newest version, delete it to restore "
                "the table — a commit it claims to record never completed."
            ) from None

    def latest_version(self) -> int:
        vs = self.versions()
        if not vs:
            raise VersionedTableError(f"no versions at {self.path}")
        return vs[-1]

    def history(self) -> list[dict]:
        """Per-version metadata, newest first (DeltaTable.history parity)."""
        return [self.manifest(v) for v in reversed(self.versions())]

    def resolve_version(self, version: int | None = None, relative_version: int | None = None,
                        timestamp: float | str | None = None) -> int:
        """Arc's relativeVersion: 0 = latest, -1 = previous, …
        (scd2-job.ipynb:471). Absolute ``version`` wins if given;
        ``timestamp`` (Delta's timestampAsOf — epoch seconds or an
        ISO/'YYYY-MM-DD HH:MM:SS' string, naive = UTC) resolves to the
        newest version committed at or before that instant."""
        vs = self.versions()
        if not vs:
            raise VersionedTableError(f"no versions at {self.path}")
        if version is not None:
            if version not in vs:
                raise VersionedTableError(f"version {version} not in {vs}")
            return version
        if timestamp is not None:
            cutoff = parse_timestamp_cutoff(timestamp)
            eligible = [v for v in vs
                        if float(self.manifest(v).get("timestamp", 0.0)) <= cutoff]
            if not eligible:
                raise VersionedTableError(
                    f"no version committed at or before {timestamp!r} "
                    f"(earliest is v{vs[0]})"
                )
            return eligible[-1]
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

    def files(self, version: int | None = None, relative_version: int | None = None) -> list[str]:
        """Table-relative data-file paths composing a snapshot."""
        v = self.resolve_version(version, relative_version)
        return list(self.manifest(v)["files"])

    # --- read / write -----------------------------------------------------

    def prune_files(
        self,
        filters: list[tuple[str, str, object]],
        version: int | None = None,
        relative_version: int | None = None,
    ) -> list[str]:
        """Data skipping: the subset of a snapshot's files that might
        contain rows matching ALL conjuncts ``(col, op, value)`` (ops:
        ``= < <= > >= in``), decided from manifest stats alone — no
        file is opened. Conservative: a file without stats for a
        column is kept."""
        v = self.resolve_version(version, relative_version)
        m = self.manifest(v)
        stats = m.get("stats", {})
        kept = []
        for f in m["files"]:
            fstats = stats.get(f)
            if fstats and fstats.get("rows") == 0:
                continue  # a zero-row file matches nothing
            cols = fstats.get("columns", {}) if fstats else {}
            if all(
                _file_may_match(cols.get(c) if fstats else None, op, val)
                for c, op, val in filters
            ):
                kept.append(f)
        return kept

    def read(
        self,
        version: int | None = None,
        relative_version: int | None = None,
        filters: list[tuple[str, str, object]] | None = None,
        timestamp: float | str | None = None,
    ) -> DataFrame:
        from pyspark.sql.types import StructType

        v = self.resolve_version(version, relative_version, timestamp)
        rel = (
            self.prune_files(filters, version=v) if filters else self.files(v)
        )
        schema = StructType.fromJson(self.manifest(v)["schema"])
        if not rel:
            df = self.spark.createDataFrame([], schema)
        else:
            # read under the manifest's schema, not the files' own: after a
            # schema-evolving append the snapshot mixes files written under
            # older schemas — the explicit schema makes the scan fill their
            # missing columns with NULL (and keeps the scan single-pass: no
            # footer-merging inference job)
            df = self.spark.read.schema(schema).parquet(
                *[f"{self.path}/{f}" for f in rel]
            )
        # residual filter: pruning is file-granular and conservative, so
        # the predicate is still applied row-level (and reaches the
        # parquet scan as a pushed filter for row-group skipping)
        _COL_OPS = {
            "=": lambda col, v: col == F.lit(v),
            "<": lambda col, v: col < F.lit(v),
            "<=": lambda col, v: col <= F.lit(v),
            ">": lambda col, v: col > F.lit(v),
            ">=": lambda col, v: col >= F.lit(v),
            "in": lambda col, v: col.isin(list(v)),
        }
        for c, op, val in filters or []:
            df = df.filter(_COL_OPS[op](F.col(c), val))
        return df

    _ZORDER_BITS = 16

    def _zorder_key(self, df: DataFrame, cols: list[str]) -> tuple[DataFrame, str]:
        return zorder_key(df, cols, self._ZORDER_BITS)

    def _write_data_files(self, df: DataFrame, version: int,
                          num_partitions: int | None,
                          cluster_by: list[str] | None = None,
                          cluster_method: str = "range",
                          bloom_filter_columns: list[str] | None = None,
                          unique_dir: bool = False) -> list[str]:
        """Write ``df`` under ``data/v{version}/`` (appends:
        ``data/v{version}-{uuid8}/`` — a unique staging dir per writer,
        so concurrent appends that both picked the same next version
        never collide at the data write; the manifest's explicit file
        list makes the dir name irrelevant to readers) and return the
        table-relative paths of the files written.

        ``cluster_by`` with ``cluster_method='range'`` range-partitions
        on the given columns and sorts within partitions
        (liquid-clustering analogue): each output file covers a narrow,
        mostly disjoint slice of the clustering key space, which is
        what makes min/max data skipping selective — on the LEADING
        column. ``cluster_method='zorder'`` clusters on an
        interleaved-bit key instead, narrowing per-file ranges on EVERY
        clustered column at once (multi-dimensional skipping)."""
        if cluster_by and cluster_method == "zorder":
            n = int(num_partitions) if num_partitions else \
                df.sparkSession.sparkContext.defaultParallelism
            out_cols = list(df.columns)
            df, zkey = self._zorder_key(df, cluster_by)
            df = (
                df.repartitionByRange(n, zkey)
                .sortWithinPartitions(zkey)
                .select(*out_cols)
            )
        elif cluster_by:
            n = int(num_partitions) if num_partitions else \
                df.sparkSession.sparkContext.defaultParallelism
            df = df.repartitionByRange(n, *cluster_by).sortWithinPartitions(*cluster_by)
        elif num_partitions:
            df = df.repartition(int(num_partitions))
        rel_dir = f"data/v{version:08d}"
        if unique_dir:
            import uuid as _uuid

            rel_dir += f"-{_uuid.uuid4().hex[:8]}"
        writer = df.write.mode("errorifexists")
        for c in bloom_filter_columns or []:
            # parquet-level bloom filters: the reader skips whole row
            # groups on `col = x` probes that min/max stats can't prune
            # (high-cardinality point lookups — id fetches, digest
            # probes). Purely additive file metadata; costs write-side
            # space only on the named columns.
            writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
        writer.parquet(f"{self.path}/{rel_dir}")
        local = self._local_root()
        if local is not None:  # see _local_root — read-side fast path
            return sorted(
                f"{rel_dir}/{fn}"
                for fn in os.listdir(os.path.join(local, rel_dir))
                if not fn.startswith("_") and not fn.startswith(".")
            )
        fs = self._fs()
        out = []
        for st in fs.listStatus(self._jpath(rel_dir)):
            fn = st.getPath().getName()
            if not fn.startswith("_") and not fn.startswith("."):
                out.append(f"{rel_dir}/{fn}")
        return sorted(out)

    def _collect_stats(self, rel_files: list[str], schema,
                       stats_columns: list[str] | None = None) -> dict:
        """Per-file ``{rows, columns: {col: {min, max, nulls}}}`` for
        scalar columns of the just-written files (never carried ones).

        Fast path: the parquet writer already put min/max/null-count in
        every file's footer — for local tables those footers are read
        driver-side with pyarrow (KB of metadata, zero Spark jobs).
        Timestamp columns are skipped there (Spark's default INT96
        encoding carries no footer stats; absent stats just mean the
        file is conservatively kept when pruning on that column).
        Fallback for non-local URIs or unreadable footers: ONE Spark
        aggregate job over the new files, stats columns only.
        ``stats_columns`` narrows the set at wide tables."""
        eligible = [
            f.name for f in schema.fields
            if f.dataType.simpleString() in _STATS_TYPES
            and (stats_columns is None or f.name in stats_columns)
        ]
        if not eligible or not rel_files:
            return {}
        if self._local_dir() is not None:
            # footer stats for INT96 timestamps don't exist, and footer
            # tz normalization differs from the collect path's — skip
            # timestamps on the fast path (absent stats ⇒ file is
            # conservatively kept when pruning on them)
            footer_cols = [
                c for c in eligible
                if not next(
                    f.dataType.simpleString() for f in schema.fields
                    if f.name == c
                ).startswith("timestamp")
            ]
            try:
                return self._collect_stats_footers(rel_files, footer_cols)
            except Exception:
                pass  # unreadable/odd footers — pay for the scan instead
        df = (
            self.spark.read.schema(schema)
            .parquet(*[f"{self.path}/{f}" for f in rel_files])
            .withColumn("__file", F.regexp_extract(F.input_file_name(), self._FILE_RE, 1))
        )
        aggs = [F.count(F.lit(1)).alias("__rows")]
        for c in eligible:
            aggs += [
                F.min(c).alias(f"__min_{c}"),
                F.max(c).alias(f"__max_{c}"),
                F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
            ]
        stats: dict[str, dict] = {}
        for r in df.groupBy("__file").agg(*aggs).collect():
            stats[r["__file"]] = {
                "rows": r["__rows"],
                "columns": {
                    c: {
                        "min": _stat_encode(r[f"__min_{c}"]),
                        "max": _stat_encode(r[f"__max_{c}"]),
                        "nulls": r[f"__nulls_{c}"],
                    }
                    for c in eligible
                },
            }
        return stats

    def _local_dir(self) -> str | None:
        """The table's plain filesystem directory, or None when it
        lives on a non-local URI (s3a://…, hdfs://…, file://host/…).
        Same resolution as :meth:`_local_root` (netloc-aware, bare
        paths local only under a ``file:`` defaultFS)."""
        return self._local_root()

    def _collect_stats_footers(self, rel_files: list[str],
                               eligible: list[str]) -> dict:
        """Assemble per-file stats from parquet footer metadata alone —
        driver-side pyarrow reads, no Spark job. Bounds stay
        conservative under parquet's stats truncation (a truncated min
        is a prefix ≤ the true min; a truncated max is bumped to remain
        an upper bound), which only ever widens the keep-range."""
        import pyarrow.parquet as pq

        base = self._local_dir()
        want = set(eligible)
        stats: dict[str, dict] = {}
        for f in rel_files:
            md = pq.ParquetFile(f"{base}/{f}").metadata
            per_col: dict[str, dict] = {}
            usable = dict.fromkeys(want, True)
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                for ci in range(rg.num_columns):
                    col = rg.column(ci)
                    name = col.path_in_schema
                    if name not in want or not usable[name]:
                        continue
                    st = col.statistics
                    if st is None or st.null_count is None:
                        usable[name] = False
                        continue
                    e = per_col.setdefault(name, {"min": None, "max": None, "nulls": 0})
                    e["nulls"] += st.null_count
                    if st.has_min_max:
                        mn, mx = _stat_encode(st.min), _stat_encode(st.max)
                        e["min"] = mn if e["min"] is None else min(e["min"], mn)
                        e["max"] = mx if e["max"] is None else max(e["max"], mx)
                    elif st.null_count < rg.num_rows:
                        usable[name] = False  # values present but unbounded
            stats[f] = {
                "rows": md.num_rows,
                "columns": {c: e for c, e in per_col.items() if usable[c]},
            }
        return stats

    def _carried_stats(self, prev_version: int, carried: list[str]) -> dict:
        """Stats entries for files carried by reference from the
        previous manifest (never re-scanned)."""
        prev = self.manifest(prev_version).get("stats", {})
        return {f: prev[f] for f in carried if f in prev}

    def _commit(self, version: int, operation: str, files: list[str],
                schema: dict, extra: dict | None = None,
                stats: dict | None = None) -> int:
        manifest = {
            "version": version,
            "operation": operation,
            "timestamp": time.time(),
            "files": files,
            "schema": schema,
            "stats": stats or {},
            **(extra or {}),
        }
        self._write_text_atomic(f"v{version:08d}.json", json.dumps(manifest))
        return version

    def _classify_winner(self, wv: int, operation: str,
                         read_files: set, removed_files: set,
                         reads_table_data: bool,
                         read_triples: list | None = None,
                         read_tree=None) -> None:
        """Classify ONE winner manifest against the loser's declared
        footprint — raise the named conflict or return (commute). The
        winner's changes are its manifest diff against its predecessor
        (manifests are contiguous inside a race window: every version
        is predecessor+1 and the loser holds the base)."""
        wm = self.manifest(wv)
        pm = self.manifest(wv - 1)
        win_op = wm.get("operation", "commit")
        ctx = (f"{operation} at {self.path} lost the commit race for "
               f"version {wv} to a concurrent {win_op}")
        if wm.get("schema") != pm.get("schema"):
            # the winner EVOLVED the schema; the loser's rewritten
            # files (and the schema it would re-commit) were derived
            # under the old one — rebasing would silently downgrade
            # the winner's evolution
            raise VersionedSchemaChangedError(
                f"{ctx} that changed the table schema — re-read the "
                "table and re-run the operation")
        win_files = set(wm.get("files") or [])
        prev_files = set(pm.get("files") or [])
        win_removed = prev_files - win_files
        win_added = win_files - prev_files
        hit = win_removed & removed_files
        if hit:
            raise VersionedConcurrentDeleteDeleteError(
                f"{ctx} that already removed file(s) this operation "
                f"also removes (e.g. {sorted(hit)[0]!r})")
        hit = win_removed & read_files
        if hit:
            raise VersionedConcurrentDeleteReadError(
                f"{ctx} that removed file(s) this operation read "
                f"(e.g. {sorted(hit)[0]!r})")
        if reads_table_data and win_added and win_op != "COMPACT":
            # COMPACT's adds are row-preserving rewrites of files it
            # removed (caught above when they overlap the loser's
            # footprint); any other data-adding winner may change what
            # a table-reading op's predicate matched — UNLESS the
            # loser's read predicate (its ON-condition target
            # conjuncts) provably excludes every added file by the
            # winner's own manifest stats (the bridge's
            # predicate-scoped rule, on manifests): a merge over
            # k='A' commutes with an append whose files hold only
            # k='B'. Missing stats keep the file → conflict.
            if read_triples or read_tree is not None:
                wstats = wm.get("stats", {})

                def _may(f: str) -> bool:
                    fs = wstats.get(f)
                    if fs and fs.get("rows") == 0:
                        return False  # a zero-row file matches nothing
                    cols = fs.get("columns", {}) if fs else {}
                    return all(
                        _file_may_match(cols.get(c) if fs else None,
                                        op, val)
                        for c, op, val in (read_triples or []))

                overlap = [f for f in win_added if _may(f)]
                if read_tree is not None:
                    # scope-tree fallback/refinement (OR/NOT shapes the
                    # conjunct extractor can't take): files whose stats
                    # envelope provably falsifies the whole reduced
                    # predicate commute
                    overlap = [f for f in overlap
                               if _manifest_tree_may_match(
                                   wstats.get(f), read_tree)]
                if not overlap:
                    return
                raise VersionedConcurrentAppendError(
                    f"{ctx} that added data file(s) inside this "
                    f"operation's read predicate (e.g. "
                    f"{sorted(overlap)[0]!r}) — re-read the table and "
                    "re-run the operation")
            raise VersionedConcurrentAppendError(
                f"{ctx} that added data file(s) this operation's "
                "predicate may depend on — re-read the table and "
                "re-run the operation")

    def _commit_classified(self, read_v: int, operation: str,
                           removed_files: list[str], new_files: list[str],
                           schema, new_stats: dict,
                           reads_table_data: bool, read_files: set,
                           read_triples: list | None = None,
                           read_tree=None,
                           extra: dict | None = None,
                           max_retries: int = 200) -> int:
        """Commit a snapshot-rewriting operation (MERGE / COMPACT) with
        the bridge's optimistic-concurrency contract on manifests: on a
        lost race every winner is classified
        (:meth:`_classify_winner`); commuting winners (a blind append
        racing a COMPACT — the hourly-append + nightly-OPTIMIZE shape)
        REBASE the loser onto the winner's snapshot (carried files and
        stats recomputed; the staged data files commit verbatim at the
        higher version — manifests may reference any earlier version's
        data dir) and retry. Conflicting winners raise the named error
        instead of a raw CommitRaceLostError."""
        removed = set(removed_files)
        schema_json = schema.jsonValue()
        base_v, attempt = read_v, read_v + 1
        # max_retries is a LIVELOCK BACKSTOP, not a fairness bound:
        # every lost race means another writer's commit landed, so
        # system progress is guaranteed; N concurrent writers can hand
        # one of them up to N-1 legitimate losses. Repeated losses
        # back off with growing jitter (the bridge treatment).
        for lost in range(max_retries):
            if lost > 4:
                import random as _rnd
                import time as _t
                _t.sleep(min(0.1, 0.005 * (2 ** min(lost - 5, 4)))
                         * (0.5 + _rnd.random()))
            carried = [f for f in self.files(base_v) if f not in removed]
            stats = dict(new_stats)
            stats.update(self._carried_stats(base_v, carried))
            if extra is not None and "files_carried" in extra:
                extra = {**extra, "files_carried": len(carried)}
            try:
                return self._commit(attempt, operation,
                                    carried + new_files, schema_json,
                                    extra=extra, stats=stats)
            except CommitRaceLostError:
                pass
            latest = self.versions()[-1]
            for wv in range(attempt, latest + 1):
                self._classify_winner(wv, operation, read_files, removed,
                                      reads_table_data, read_triples,
                                      read_tree=read_tree)
            base_v, attempt = latest, latest + 1
        raise VersionedConcurrentModificationError(
            f"{operation} at {self.path}: exhausted {max_retries} commit "
            "retries against concurrent writers")

    def write(self, df: DataFrame, mode: str = "overwrite", num_partitions: int | None = None,
              operation: str = "WRITE", merge_schema: bool = False,
              cluster_by: list[str] | None = None,
              cluster_method: str = "range",
              stats_columns: list[str] | None = None,
              bloom_filter_columns: list[str] | None = None,
              extra: dict | None = None) -> int:
        """Commit ``df`` as a new version. ``mode='append'`` adds files
        to the current snapshot (no rewrite of existing data);
        ``'overwrite'`` replaces the snapshot.

        Appends enforce the table schema (fail-loud like Delta): a
        drifted ``df`` is rejected unless ``merge_schema=True``, which
        widens the manifest schema with the new columns (existing files
        are untouched — the schema-aware scan in :meth:`read` fills
        their missing columns with NULL). Same-name columns must keep
        their type; silent type changes corrupt every older file."""
        from pyspark.sql.types import StructType

        vs = self.versions()
        if mode not in ("overwrite", "append", "errorifexists"):
            raise VersionedTableError(f"unsupported saveMode {mode}")
        if mode == "errorifexists" and vs:
            raise VersionedTableError(f"table exists at {self.path}")

        schema = df.schema
        if mode == "append" and vs:
            old = StructType.fromJson(self.manifest(vs[-1])["schema"])
            old_types = {f.name: f.dataType for f in old.fields}
            new_fields = [f for f in df.schema.fields if f.name not in old_types]
            for f in df.schema.fields:
                if f.name in old_types and f.dataType != old_types[f.name]:
                    raise VersionedTableError(
                        f"append changes type of column {f.name!r}: "
                        f"{old_types[f.name].simpleString()} -> {f.dataType.simpleString()}"
                    )
            if new_fields and not merge_schema:
                raise VersionedTableError(
                    f"append adds columns {[f.name for f in new_fields]}; "
                    "pass merge_schema=True to evolve the table schema"
                )
            schema = StructType(list(old.fields) + new_fields)

        new_v = (vs[-1] + 1) if vs else 0
        new_files = self._write_data_files(df, new_v, num_partitions, cluster_by,
                                           cluster_method, bloom_filter_columns,
                                           unique_dir=(mode == "append"))
        carried = self.files(vs[-1]) if (mode == "append" and vs) else []
        new_stats = self._collect_stats(new_files, df.schema, stats_columns)
        stats = dict(new_stats)
        if carried:
            stats.update(self._carried_stats(vs[-1], carried))
        op = operation if mode != "append" else "APPEND"
        if mode != "append":
            # snapshot-replacing commits keep single-winner semantics:
            # the loser's result was computed from a stale snapshot
            return self._commit(new_v, op, carried + new_files,
                                schema.jsonValue(), stats=stats, extra=extra)
        # APPEND is blind: on a lost race, re-base on the winner's
        # snapshot (its file list + stats), re-validate the schema
        # against the winner's, and retry at the next version — the
        # same optimistic-concurrency contract as the Delta bridge's
        # blind appends. A manifest may reference files written under
        # any earlier version's data dir, so the staged files commit
        # verbatim at the higher version.
        attempt_v, attempt_schema = new_v, schema
        for lost in range(200):
            if lost > 4:  # jittered backoff past repeated losses
                import random as _rnd
                import time as _t
                _t.sleep(min(0.1, 0.005 * (2 ** min(lost - 5, 4)))
                         * (0.5 + _rnd.random()))
            try:
                return self._commit(attempt_v, op, carried + new_files,
                                    attempt_schema.jsonValue(), stats=stats,
                                    extra=extra)
            except CommitRaceLostError:
                pass
            latest = self.versions()[-1]
            bid = (extra or {}).get("stream_batch_id")
            if bid is not None:
                for wv in range(attempt_v, latest + 1):
                    if self.manifest(wv).get("stream_batch_id") == bid:
                        raise ConcurrentStreamBatchError(
                            f"append at {self.path}: a racing writer "
                            f"already committed stream_batch_id {bid} "
                            f"at version {wv} — the batch is in the "
                            "table exactly once"
                        )
            wm = self.manifest(latest)
            win = StructType.fromJson(wm["schema"])
            win_types = {f.name: f.dataType for f in win.fields}
            fresh = [f for f in df.schema.fields if f.name not in win_types]
            for f in df.schema.fields:
                if f.name in win_types and f.dataType != win_types[f.name]:
                    raise VersionedTableError(
                        f"append lost a commit race to a writer that "
                        f"changed column {f.name!r} to "
                        f"{win_types[f.name].simpleString()} — re-read "
                        "the table and re-run"
                    )
            if fresh and not merge_schema:
                raise VersionedTableError(
                    f"append lost a commit race to a writer whose schema "
                    f"lacks {[f.name for f in fresh]}; pass "
                    "merge_schema=True to evolve, or re-run"
                )
            attempt_schema = StructType(list(win.fields) + fresh)
            carried = list(wm["files"])
            stats = dict(new_stats)
            stats.update(self._carried_stats(latest, carried))
            attempt_v = latest + 1
        raise VersionedTableError(
            f"append at {self.path}: exhausted 200 commit retries against "
            "concurrent writers"
        )

    def compact(
        self,
        small_file_bytes: int = 32 * 1024 * 1024,
        num_partitions: int = 1,
    ) -> int:
        """Bin-pack small data files (OPTIMIZE analogue): files under
        ``small_file_bytes`` are read back and rewritten as
        ``num_partitions`` files; larger files are carried by
        reference. Commits a ``COMPACT`` version — row content is
        unchanged (the CDF between the two versions is empty), and
        time travel to pre-compact versions still works because their
        manifests keep referencing the old files until :meth:`vacuum`.

        This is the maintenance pass a streaming append sink needs:
        micro-batch commits accumulate one small file per batch, and a
        100 TB scan pays per-file open/seek costs (and loses row-group
        pruning) until they're packed."""
        from pyspark.sql.types import StructType

        fs = self._fs()
        cur = self.files()
        small = [
            f for f in cur
            if fs.getFileStatus(self._jpath(f)).getLen() < small_file_bytes
        ]
        if len(small) <= 1:
            return self.latest_version()  # nothing to pack
        carried = [f for f in cur if f not in set(small)]
        # read under the manifest schema, never file-footer inference:
        # after a schema-evolving append the small files mix schemas,
        # and inferring from one footer would silently drop the evolved
        # columns from the rewritten rows AND from the new manifest
        schema = StructType.fromJson(self.manifest(self.latest_version())["schema"])
        df = self.spark.read.schema(schema).parquet(
            *[f"{self.path}/{f}" for f in small]
        )
        cur_v = self.latest_version()
        new_files = self._write_data_files(df, cur_v + 1, num_partitions,
                                           unique_dir=True)
        stats = self._collect_stats(new_files, schema)
        # COMPACT reads (and removes) exactly its small inputs and
        # preserves rows, so a racing blind APPEND commutes: the loser
        # REBASES onto the winner's snapshot and retries (the
        # hourly-append + nightly-OPTIMIZE shape, the same commute the
        # bridge's OPTIMIZE has) — while a winner that removed or
        # rewrote any input raises the named conflict
        return self._commit_classified(
            cur_v, "COMPACT", small, new_files, schema, stats,
            reads_table_data=False, read_files=set(small),
            extra={"files_compacted": len(small), "files_carried": len(carried)},
        )

    def restore(self, version: int | None = None,
                relative_version: int | None = None) -> int:
        """Delta RESTORE analogue: re-commit an earlier snapshot's file
        list (and schema/stats) as the new latest version. No data is
        copied — files are immutable and shared across manifests
        (copy-on-write), so a restore is a metadata-only commit, and
        the restored files are referenced by the new manifest, which
        keeps vacuum from collecting them."""
        src_v = self.resolve_version(version, relative_version)
        m = self.manifest(src_v)
        new_v = self.latest_version() + 1
        return self._commit(new_v, f"RESTORE_v{src_v}", m["files"],
                            m["schema"], stats=m.get("stats", {}))

    def vacuum(self, retain_versions: int = 1,
               staging_grace_hours: float = 24.0) -> list[str]:
        """Delete data files referenced only by versions older than the
        newest ``retain_versions``, and drop those versions' manifests
        (they could no longer be read). Returns the deleted data-file
        paths. The physical-delete pass of the copy-on-write design —
        run after compaction, outside any time-travel retention window.
        Metadata-sized work only: the file lists live in manifests, so
        no data is scanned.

        ``staging_grace_hours``: unreferenced files YOUNGER than this
        are kept — a concurrent appender stages its data files BEFORE
        the manifest claim (and may be mid-retry under the round-10
        append OCC), so "unreferenced" is not "dead" for recent files;
        Delta's VACUUM applies the same mtime grace to untracked files.
        Pass 0 only when no writer can be live (tests/maintenance)."""
        import time as _time

        if retain_versions < 1:
            raise VersionedTableError("retain_versions must be >= 1")
        vs = self.versions()
        keep_vs = vs[-retain_versions:]
        drop_vs = vs[:-retain_versions]
        fs = self._fs()
        # manifests first: a crash mid-vacuum must never leave a listed
        # version pointing at deleted files (reads would die with raw
        # FileNotFound instead of a clean resolve error)
        for v in drop_vs:
            fs.delete(self._jpath("_meta", f"v{v:08d}.json"), False)
        # then GC by physical listing — every unreferenced data file
        # PAST THE STAGING GRACE goes, which also reclaims files
        # orphaned by an earlier crash (manifests deleted, files not)
        # without ever racing a live appender's staged-but-uncommitted
        # files.
        cutoff_ms = (_time.time() - staging_grace_hours * 3600.0) * 1000.0
        live = {f for v in keep_vs for f in self.files(v)}
        dead = []
        data_root = self._jpath("data")
        if fs.exists(data_root):
            for vdir in fs.listStatus(data_root):
                vname = vdir.getPath().getName()
                for st in fs.listStatus(vdir.getPath()):
                    fn = st.getPath().getName()
                    rel = f"data/{vname}/{fn}"
                    if (rel not in live
                            and st.getModificationTime() < cutoff_ms):
                        dead.append(rel)
        for f in sorted(dead):
            fs.delete(self._jpath(f), False)
        return sorted(dead)

    def changes(
        self,
        from_version: int,
        to_version: int | None = None,
        change_col: str = "change_type",
    ) -> DataFrame:
        """Change data feed between two versions: rows added between
        ``from_version`` and ``to_version`` (default latest) tagged
        ``insert``, rows removed tagged ``delete`` (an update appears
        as its delete+insert pair, like Delta CDF without explicit
        update tracking).

        Scale posture — this is a *file-pruned* diff: data files are
        immutable and shared across manifests (copy-on-write), so any
        file present in both snapshots contributes nothing and is never
        read. Only the symmetric difference of the two file lists is
        scanned, and the row-level diff (``exceptAll`` both ways — a
        hash aggregate) runs over just those files. A merge that
        rewrote 1 of N files diffs ~2 files, not 2 snapshots. Rows
        carried *unchanged through a rewritten file* appear in both
        sides and cancel in the multiset difference."""
        va = self.resolve_version(from_version)
        vb = self.resolve_version(to_version)
        fa, fb = set(self.files(va)), set(self.files(vb))

        from pyspark.sql.types import StructType

        schema = StructType.fromJson(self.manifest(vb)["schema"])

        def _read(rel: list[str]) -> DataFrame:
            if not rel:
                return self.spark.createDataFrame([], schema)
            return self.spark.read.schema(schema).parquet(
                *[f"{self.path}/{f}" for f in sorted(rel)]
            )

        removed = _read(list(fa - fb))
        added = _read(list(fb - fa))
        return added.exceptAll(removed).withColumn(
            change_col, F.lit("insert")
        ).unionByName(
            removed.exceptAll(added).withColumn(change_col, F.lit("delete"))
        )

    # --- merge (the SCD2 workhorse) ----------------------------------------

    _FILE_RE = r"(data/v\d{8}(?:-[0-9a-f]{8})?/[^/]+)$"

    def _matched_files(self, source: DataFrame, condition: str,
                       files: list[str] | None = None) -> list[str]:
        """Data files containing at least one row matching the merge
        condition — one semi-join job whose output is a (tiny) file
        list. This is the copy-on-write pruning step: everything else
        is carried forward untouched. ``files`` limits the scan to a
        stats-pruned candidate subset (None = the whole snapshot)."""
        from pyspark.sql.types import StructType

        if files is None:
            target = self.read()
        else:
            if not files:
                return []
            schema = StructType.fromJson(
                self.manifest(self.latest_version())["schema"])
            target = self.spark.read.schema(schema).parquet(
                *[f"{self.path}/{f}" for f in files])
        tagged = (
            target
            .withColumn("__file", F.regexp_extract(F.input_file_name(), self._FILE_RE, 1))
            .alias("target")
        )
        rows = (
            tagged.join(source.alias("source"), F.expr(condition), "left_semi")
            .select("__file")
            .distinct()
            .collect()
        )
        return sorted(r["__file"] for r in rows)

    def _matched_files_and_max_match(
        self, source: DataFrame, condition: str, files: list[str],
    ) -> tuple[list[str], int]:
        """:meth:`_matched_files` FUSED with the unique-match
        validation count — one inner-join job computes both the
        matched-file list and the maximum number of source rows any
        single target row matches (Delta errors on >1). The separate
        shapes paid the target⋈source join twice (semi-join for files,
        inner join + groupBy for the dup count): a full extra join pass
        at 100 TB and ~0.5s of job latency per merge at bench SF. The
        per-row surrogate id only needs stability within this one
        action, which monotonically_increasing_id is; ``__n`` and
        ``first(__file)`` are map-side combinable.

        The file list comes back as one ROW PER DISTINCT FILE via a
        second grouped aggregate (``groupBy(__file).max(__n)``), never
        as a single-row ``collect_set``: a 100 TB merge matching ~10⁶
        files would otherwise funnel an ~O(100 MB) array through ONE
        reduce task's row (r13 verdict #3). The collect's driver-side
        cardinality equals the matched-file count — exactly what the
        old separate semi-join pass collected."""
        from pyspark.sql.types import StructType

        if not files:
            return [], 0
        schema = StructType.fromJson(
            self.manifest(self.latest_version())["schema"])
        target = self.spark.read.schema(schema).parquet(
            *[f"{self.path}/{f}" for f in files])
        tagged = (
            target
            .withColumn("__file", F.regexp_extract(F.input_file_name(), self._FILE_RE, 1))
            .withColumn("__merge_rid", F.monotonically_increasing_id())
            .alias("target")
        )
        per_rid = (
            tagged.join(source.alias("source"), F.expr(condition), "inner")
            .groupBy("__merge_rid")
            .agg(F.count(F.lit(1)).alias("__n"), F.first("__file").alias("__file"))
        )
        rows = per_rid.groupBy("__file").agg(F.max("__n").alias("mx")).collect()
        return (sorted(r["__file"] for r in rows),
                max((int(r["mx"]) for r in rows), default=0))

    def merge(
        self,
        source: DataFrame,
        condition: str,
        when_matched_update: dict[str, object] | None = None,
        matched_condition: str | None = None,
        insert_not_matched: bool = True,
        num_partitions: int | None = None,
        validate_unique_match: bool = True,
        when_matched_delete: str | None = None,
        when_not_matched_by_source_delete: str | None = None,
    ) -> int:
        """Delta-style ``MERGE INTO`` (DeltaLakeMergeLoad parity,
        scd2-job.ipynb:337-354), plus delta-spark's delete clauses
        (``when_matched_delete`` — evaluated before the update clause,
        the op='D'-first CDC shape — and
        ``when_not_matched_by_source_delete`` for reconciliation
        deletes; see :func:`build_merge_annotated`). The
        not-matched-by-source clause inspects every target row, so it
        widens the rewrite set to ALL files — the same full-table cost
        delta-spark pays for it.

        ``condition`` / ``matched_condition`` / update values are SQL
        expressions over ``source.*`` and ``target.*`` aliases — exactly
        the reference's config surface (condition at :344, matched
        update at :345-350, not-matched insert at :353). NULL merge keys
        on the source route rows to the insert branch via standard SQL
        null semantics (scd2-job.ipynb:298,309) — no special code.

        Physical shape (copy-on-write at file granularity):

        1. one semi-join finds the target files containing matched rows;
        2. only those files join the source (full-outer on the
           condition) and are rewritten with update/insert branches
           applied — a source row that matches nothing in the matched
           subset matches nothing globally, so insert routing over the
           subset is exact;
        3. unmatched files are carried forward by reference in the new
           manifest — a merge touching 1 of N files rewrites ~1 file.
        """
        vs = self.versions()
        if not vs:
            raise VersionedTableError(f"no versions at {self.path}")
        cur_v = vs[-1]
        # Arc/Spark-3 compat: `target.iscurrent = true` against the
        # INTEGER iscurrent column (scd2-job.ipynb:346) relied on the
        # BooleanEquality coercion Spark 4 removed — rewrite boolean
        # literals compared to known non-boolean columns (dtype-aware;
        # genuine boolean columns keep their literal).
        from sql_based_etl_spark.engine.sql_compat import coerce_condition_for_types

        # one snapshot construction serves the dtype probe here AND the
        # rewrite below (r14): each read() re-fetches the manifest and
        # re-analyzes the scan — pure driver latency, ~0.1-0.3s at
        # bench SF and manifest-sized at a 10⁶-file table
        target_full = self.read()
        dtmap = {"target": dict(target_full.dtypes), "source": dict(source.dtypes)}
        condition = coerce_condition_for_types(condition, dtmap)
        if matched_condition:
            matched_condition = coerce_condition_for_types(matched_condition, dtmap)
        all_files = self.files(cur_v)
        # Predicate-scoped read footprint (round-11, the Delta bridge's
        # rule on manifests): the ON condition's target-only conjuncts
        # prune the matched-file scan via manifest stats (a merge whose
        # ON pins a clustered key range opens only that range's files)
        # and scope OCC — a racing append whose new files provably
        # miss the predicate commutes. A by-source clause inspects
        # every target row and disables both.
        from sql_based_etl_spark.engine.sql_compat import (
            condition_implied_triples,
        )

        from sql_based_etl_spark.engine.sql_compat import (
            condition_scope_tree,
        )

        read_triples: list[tuple] = []
        read_tree = None
        if not when_not_matched_by_source_delete:
            t_cols_all = [f["name"] for f in
                          self.manifest(cur_v)["schema"]["fields"]]
            read_triples = [
                t for t in condition_implied_triples(condition, t_cols_all,
                                                     "target")
                if t[1] in _FILTER_OPS  # manifest stats: no null tests
            ]
            # scope-tree fallback for OR/NOT shapes (the bridge's
            # round-12 rule on manifests): the whole ON condition
            # reduced to its stats-decidable implication
            read_tree = condition_scope_tree(condition, t_cols_all,
                                             "target")
        scan_files = (self.prune_files(read_triples, version=cur_v)
                      if read_triples else all_files)
        if read_tree is not None and scan_files:
            mstats = self.manifest(cur_v).get("stats", {})
            scan_files = [f for f in scan_files
                          if _manifest_tree_may_match(mstats.get(f),
                                                      read_tree)]
        validated_in_scan = False
        if when_not_matched_by_source_delete:
            matched_files = list(all_files)  # clause touches every row
        elif validate_unique_match:
            # fused pass: matched files + the unique-match validation
            # count in ONE join job (see _matched_files_and_max_match)
            matched_files, max_match = self._matched_files_and_max_match(
                source, condition, scan_files)
            if max_match > 1:
                raise VersionedTableError(
                    "merge: multiple source rows match a single target row"
                )
            validated_in_scan = True
        else:
            # validation opted out: the left-semi prune short-circuits
            # per target row, instead of shuffling every joined row
            # through the fused count aggregate for a count nobody
            # checks (a high-fanout condition makes that k× the rows)
            matched_files = self._matched_files(source, condition,
                                                scan_files)
        carried = [f for f in all_files if f not in set(matched_files)]

        t_cols = target_full.columns
        t_dtypes = dict(target_full.dtypes)
        if matched_files:
            # manifest schema, not footer inference: after a schema-
            # evolving append the matched files may predate the newest
            # columns — the explicit schema fills them with NULL and
            # keeps target.<col> resolvable for every manifest column
            subset = self.spark.read.schema(target_full.schema).parquet(
                *[f"{self.path}/{f}" for f in matched_files]
            )
        else:
            subset = self.spark.createDataFrame([], target_full.schema)

        result = build_merge_annotated(
            subset, source, condition,
            when_matched_update=when_matched_update,
            matched_condition=matched_condition,
            insert_not_matched=insert_not_matched,
            # already validated by the fused matched-file pass (one
            # join job instead of two) except on the by-source path
            validate_unique_match=(validate_unique_match
                                   and not validated_in_scan),
            when_matched_delete=when_matched_delete,
            when_not_matched_by_source_delete=when_not_matched_by_source_delete,
        ).filter(~F.col("__deleted")).select(*t_cols)

        # unique staging dir: racing writers that both picked the same
        # next version never collide at the data write (the round-10
        # append rule, extended to rewrites with round-11's classified
        # OCC); the manifest's explicit file list makes the dir name
        # irrelevant to readers, and vacuum's staging grace covers a
        # loser's orphaned files
        new_files = self._write_data_files(result, cur_v + 1,
                                           num_partitions, unique_dir=True)
        new_stats = self._collect_stats(new_files, target_full.schema)
        # MERGE read the stats-pruned candidate set (the whole snapshot
        # when no target conjunct was extractable); winners adding
        # files provably OUTSIDE the read predicate commute (rebase +
        # retry), anything else raises the named conflict
        return self._commit_classified(
            cur_v, "MERGE", matched_files, new_files, target_full.schema,
            new_stats, reads_table_data=True, read_files=set(scan_files),
            read_triples=(read_triples or None),
            read_tree=read_tree,
            extra={
                "files_rewritten": len(matched_files),
                "files_carried": len(carried),
            },
        )
