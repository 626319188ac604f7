"""Delta Lake interop bridge (no jars required for reads).

The reference's production tables are Delta (scd2-job.ipynb:153,
163-171); this engine's :class:`~.versioned.VersionedTable` is a
bespoke parquet+manifest format with the same semantics. This module
is the ecosystem bridge between the two:

- :func:`read_delta` — read a Delta table's snapshot (latest or
  time-travel) WITHOUT delta-spark jars, by replaying the public
  Delta transaction-log protocol (``_delta_log/%020d.json`` actions,
  plus parquet checkpoints): ``add``/``remove`` reconstruction keyed
  on file path, latest ``metaData`` wins, schema from
  ``metaData.schemaString`` (a Spark StructType JSON). Partitioned
  tables are handled by injecting ``partitionValues`` as typed
  literal columns per partition group (Delta physical files do not
  contain partition columns).
- :func:`export_snapshot` — publish a VersionedTable snapshot as
  plain parquet + a ``_schema.json`` sidecar, the handoff format any
  Delta deployment can ingest (``spark.read.parquet`` or delta-spark's
  ``CONVERT TO DELTA``).
- :func:`convert_delta_to_versioned` — import a Delta snapshot into a
  VersionedTable (read bridge + one committed write).
- :func:`delta_available` — True when delta-spark jars/python are
  importable; stage code uses it to route a ``format: delta`` table to
  the real library where it exists (the sandbox has none, so the
  bridge is the tested path).

Honest limits (fail-loud, never wrong-answer): reader features beyond
protocol ``minReaderVersion`` 1 that change data interpretation —
deletion vectors, column mapping — raise instead of returning rows
that ignore them. Log replay happens driver-side over metadata only;
at very large file counts (millions of adds) a production reader
would replay the checkpoint distributed — the checkpoint parquet here
is read through Spark already, only the surviving file LIST is
collected.
"""

from __future__ import annotations

import json
import posixpath
import urllib.parse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_based_etl_spark.tables.versioned import VersionedTable, VersionedTableError


def delta_available() -> bool:
    """True when the delta-spark package (and thus its jars) is importable."""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    return True


# --- log access (Hadoop FS, so s3a:///hdfs:// work like file://) --------


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm  # noqa: SLF001
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    conf = spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
    return jpath.getFileSystem(conf), jpath, jvm


def _read_text(spark: SparkSession, path: str) -> str:
    fs, jpath, jvm = _fs_and_path(spark, path)
    stream = fs.open(jpath)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def _list_log(spark: SparkSession, log_dir: str) -> dict[int, str]:
    """Map commit version -> JSON log file path."""
    fs, jpath, _ = _fs_and_path(spark, log_dir)
    if not fs.exists(jpath):
        raise VersionedTableError(f"not a Delta table: no _delta_log at {log_dir}")
    out: dict[int, str] = {}
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name.endswith(".json") and name[:-5].isdigit():
            out[int(name[:-5])] = f"{log_dir}/{name}"
    return out


def _check_protocol(action: dict) -> None:
    p = action["protocol"]
    if p.get("minReaderVersion", 1) > 1 or p.get("readerFeatures"):
        raise VersionedTableError(
            "Delta reader features beyond protocol v1 are not supported by "
            f"the no-jar bridge (got {p}); install delta-spark to read this "
            "table (deletion vectors / column mapping change data "
            "interpretation and must not be silently ignored)"
        )


def _check_metadata(meta: dict) -> None:
    mode = (meta.get("configuration") or {}).get("delta.columnMapping.mode", "none")
    if mode != "none":
        raise VersionedTableError(
            f"Delta column mapping mode {mode!r} is not supported by the "
            "no-jar bridge; install delta-spark"
        )


def _replay_checkpoint(spark: SparkSession, log_dir: str, cp_version: int,
                       parts: int | None) -> tuple[dict | None, dict[str, dict]]:
    """Active state as of a checkpoint: (metaData, {path: add})."""
    if parts:
        paths = [
            f"{log_dir}/{cp_version:020d}.checkpoint.{i + 1:010d}.{parts:010d}.parquet"
            for i in range(parts)
        ]
    else:
        paths = [f"{log_dir}/{cp_version:020d}.checkpoint.parquet"]
    cp = spark.read.parquet(*paths)
    meta: dict | None = None
    adds: dict[str, dict] = {}
    cols = set(cp.columns)
    if "protocol" in cols:
        for r in cp.filter(F.col("protocol.minReaderVersion").isNotNull()).collect():
            _check_protocol({"protocol": r["protocol"].asDict()})
    if "metaData" in cols:
        metas = cp.filter(F.col("metaData.id").isNotNull()).collect()
        if metas:
            m = metas[-1]["metaData"].asDict(recursive=True)
            meta = m
    # only the surviving file list is collected (checkpoints already
    # contain reconciled state: no remove tombstones needed for reads)
    for r in (
        cp.filter(F.col("add.path").isNotNull())
        .select("add.path", "add.partitionValues")
        .collect()
    ):
        adds[r["path"]] = {"path": r["path"],
                           "partitionValues": dict(r["partitionValues"] or {})}
    return meta, adds


def _last_checkpoint(spark: SparkSession, log_dir: str) -> tuple[int, int | None] | None:
    try:
        txt = _read_text(spark, f"{log_dir}/_last_checkpoint")
    except Exception:
        return None
    d = json.loads(txt)
    return int(d["version"]), d.get("parts")


def read_delta(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Read a Delta table snapshot without delta-spark jars.

    ``version=None`` reads the latest commit; an int gives Delta's
    ``versionAsOf`` time travel. Raises :class:`VersionedTableError`
    for non-Delta paths, missing versions, or tables using reader
    features the bridge cannot honor (see module docstring).
    """
    path = path.rstrip("/")
    log_dir = f"{path}/_delta_log"
    logs = _list_log(spark, log_dir)

    meta: dict | None = None
    adds: dict[str, dict] = {}
    start = 0
    cp = _last_checkpoint(spark, log_dir)
    if cp is not None and (version is None or cp[0] <= version) and (
        # prefer pure-JSON replay when every commit's JSON is present
        # (cheaper for small tables and exercises nothing extra)
        0 not in logs or cp[0] >= 10
    ):
        meta, adds = _replay_checkpoint(spark, log_dir, cp[0], cp[1])
        start = cp[0] + 1

    latest = max(logs) if logs else -1
    if version is None:
        version = max(latest, start - 1)
    elif version > latest and version >= start:
        raise VersionedTableError(
            f"Delta version {version} does not exist at {path} (latest {latest})"
        )
    if start == 0 and (not logs or min(logs) > 0):
        raise VersionedTableError(
            f"Delta log at {log_dir} is missing commit 0 and no usable "
            "checkpoint covers the gap"
        )

    for v in range(start, version + 1):
        if v not in logs:
            raise VersionedTableError(f"Delta log missing commit {v} at {log_dir}")
        for line in _read_text(spark, logs[v]).splitlines():
            if not line.strip():
                continue
            action = json.loads(line)
            if "protocol" in action:
                _check_protocol(action)
            elif "metaData" in action:
                meta = action["metaData"]
            elif "add" in action:
                adds[action["add"]["path"]] = action["add"]
            elif "remove" in action:
                adds.pop(action["remove"]["path"], None)
    if meta is None:
        raise VersionedTableError(f"Delta log at {log_dir} has no metaData action")
    _check_metadata(meta)

    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    part_cols = list(meta.get("partitionColumns") or [])
    data_schema = StructType([f for f in schema.fields if f.name not in part_cols])
    by_type = {f.name: f.dataType for f in schema.fields}

    def _abs(rel: str) -> str:
        # add.path is URL-encoded and relative unless absolute
        rel = urllib.parse.unquote(rel)
        if "://" in rel or rel.startswith("/"):
            return rel
        return posixpath.join(path, rel)

    if not adds:
        return spark.createDataFrame([], schema)
    if not part_cols:
        return spark.read.schema(data_schema).parquet(*[_abs(a["path"]) for a in adds.values()])

    # group files by identical partitionValues, inject the partition
    # columns as typed literals per group (NULL for Delta's
    # __HIVE_DEFAULT_PARTITION__ / missing entries), then union
    groups: dict[tuple, list[str]] = {}
    for a in adds.values():
        pv = a.get("partitionValues") or {}
        key = tuple(pv.get(c) for c in part_cols)
        groups.setdefault(key, []).append(_abs(a["path"]))
    out: DataFrame | None = None
    for key, files in sorted(groups.items()):
        df = spark.read.schema(data_schema).parquet(*files)
        for c, raw in zip(part_cols, key):
            lit = (
                F.lit(None) if raw is None or raw == "__HIVE_DEFAULT_PARTITION__"
                else F.lit(raw)
            )
            df = df.withColumn(c, lit.cast(by_type[c]))
        df = df.select(*[f.name for f in schema.fields])
        out = df if out is None else out.unionByName(df)
    return out


# --- export / import ----------------------------------------------------


def export_snapshot(table: VersionedTable, dest: str,
                    version: int | None = None) -> None:
    """Publish a VersionedTable snapshot as plain parquet plus a
    ``_schema.json`` sidecar at ``dest`` — the handoff format for Delta
    (or any other) tooling: ``spark.read.parquet(dest)`` just works,
    and delta-spark's ``CONVERT TO DELTA parquet.`path``` upgrades it
    in place. A snapshot export, not a log export: history stays in
    the source table."""
    v = table.resolve_version(version=version)
    df = table.read(version=v)
    df.write.mode("overwrite").parquet(dest)
    fs, jpath, _ = _fs_and_path(table.spark, f"{dest.rstrip('/')}/_schema.json")
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(json.dumps(
            {"source": table.path, "version": v,
             "schema": json.loads(df.schema.json())}
        ).encode("utf-8")))
    finally:
        out.close()


def convert_delta_to_versioned(spark: SparkSession, delta_path: str,
                               table_path: str,
                               version: int | None = None) -> VersionedTable:
    """Import a Delta snapshot into a new VersionedTable version (read
    bridge + one committed write)."""
    df = read_delta(spark, delta_path, version=version)
    t = VersionedTable(spark, table_path)
    t.write(df, mode="overwrite", operation="CONVERT_FROM_DELTA",
            extra={"source_delta_path": delta_path, "source_delta_version": version})
    return t


def is_delta_dir(spark: SparkSession, path: str) -> bool:
    """True when ``path`` holds a Delta table (has a ``_delta_log``)."""
    try:
        fs, jpath, _ = _fs_and_path(spark, f"{path.rstrip('/')}/_delta_log")
        return bool(fs.exists(jpath))
    except Exception:
        return False
