"""Delta interop bridge: the no-jar ``_delta_log`` reader is exercised
against hand-built transaction logs following the public Delta protocol
(PROTOCOL.md shapes: add/remove/metaData/protocol actions, parquet
checkpoints, partitionValues), plus the export and convert bridges.
The sandbox has no delta-spark, so these logs ARE the compatibility
contract under test."""

from __future__ import annotations

import glob
import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from sql_based_etl_spark.tables.delta_interop import (
    convert_delta_to_versioned,
    delta_available,
    export_snapshot,
    is_delta_dir,
    read_delta,
)
from sql_based_etl_spark.tables.versioned import VersionedTable, VersionedTableError

SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _write_datafile(spark, table_dir: str, name: str, ids: list[int]) -> None:
    tmp = os.path.join(table_dir, "__tmp_write")
    (
        spark.range(0)
        .sparkSession.createDataFrame([(i, f"r{i}") for i in ids], "id long, v string")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dest = os.path.join(table_dir, name)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    shutil.move(part, dest)
    shutil.rmtree(tmp)


def _log(table_dir: str, version: int, *actions: dict) -> None:
    log_dir = os.path.join(table_dir, "_delta_log")
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))


_PROTOCOL = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}


def _meta(schema_string: str = SCHEMA_STRING, partition_cols: list[str] | None = None) -> dict:
    return {
        "metaData": {
            "id": "00000000-0000-0000-0000-000000000000",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string,
            "partitionColumns": partition_cols or [],
            "configuration": {},
        }
    }


def _add(path: str, pv: dict | None = None) -> dict:
    return {"add": {"path": path, "partitionValues": pv or {}, "size": 1,
                    "modificationTime": 0, "dataChange": True}}


@pytest.fixture
def delta_dir(spark, tmp_path):
    d = str(tmp_path / "dtab")
    os.makedirs(d)
    _write_datafile(spark, d, "f0.parquet", [0, 1, 2])
    _write_datafile(spark, d, "f1.parquet", [10, 11, 12])
    _log(d, 0, _PROTOCOL, _meta(), _add("f0.parquet"))
    _log(d, 1, _add("f1.parquet"))
    _log(d, 2, {"remove": {"path": "f0.parquet", "dataChange": True}})
    return d


def _ids(df):
    return sorted(r.id for r in df.collect())


def test_read_delta_latest_and_time_travel(spark, delta_dir):
    assert _ids(read_delta(spark, delta_dir)) == [10, 11, 12]
    assert _ids(read_delta(spark, delta_dir, version=1)) == [0, 1, 2, 10, 11, 12]
    assert _ids(read_delta(spark, delta_dir, version=0)) == [0, 1, 2]
    assert read_delta(spark, delta_dir).columns == ["id", "v"]
    with pytest.raises(VersionedTableError, match="does not exist"):
        read_delta(spark, delta_dir, version=9)


def test_read_delta_rejects_unsupported_reader_features(spark, tmp_path):
    d = str(tmp_path / "dv")
    os.makedirs(d)
    _write_datafile(spark, d, "f0.parquet", [1])
    _log(d, 0, {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                             "readerFeatures": ["deletionVectors"]}},
         _meta(), _add("f0.parquet"))
    with pytest.raises(VersionedTableError, match="not supported"):
        read_delta(spark, d)


def test_read_delta_partitioned_injects_typed_partition_columns(spark, tmp_path):
    d = str(tmp_path / "part")
    os.makedirs(d)
    # physical files carry only (id, v); k comes from partitionValues
    _write_datafile(spark, d, "k=1/f0.parquet", [1, 2])
    _write_datafile(spark, d, "k=2/f1.parquet", [3])
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "string", "nullable": True, "metadata": {}},
                {"name": "k", "type": "integer", "nullable": True, "metadata": {}},
            ],
        }
    )
    _log(d, 0, _PROTOCOL, _meta(schema, ["k"]),
         _add("k%3D1/f0.parquet", {"k": "1"}), _add("k%3D2/f1.parquet", {"k": "2"}))
    df = read_delta(spark, d)
    assert df.columns == ["id", "v", "k"]
    assert dict(df.dtypes)["k"] == "int"
    assert sorted((r.id, r.k) for r in df.collect()) == [(1, 1), (2, 1), (3, 2)]


def test_read_delta_from_checkpoint_with_pruned_json(spark, tmp_path):
    """_last_checkpoint + checkpoint parquet replace the pruned JSON
    commits 0..2; JSON replay resumes after the checkpoint."""
    d = str(tmp_path / "cp")
    os.makedirs(d)
    _write_datafile(spark, d, "f1.parquet", [10, 11, 12])
    _write_datafile(spark, d, "f3.parquet", [20])
    log_dir = os.path.join(d, "_delta_log")
    os.makedirs(log_dir)
    cp_schema = (
        "protocol struct<minReaderVersion int, minWriterVersion int>, "
        "metaData struct<id string, schemaString string, "
        "partitionColumns array<string>, configuration map<string,string>>, "
        "add struct<path string, partitionValues map<string,string>, "
        "size long, dataChange boolean>, "
        "remove struct<path string>"
    )
    rows = [
        ((1, 2), None, None, None),
        (None, ("u", SCHEMA_STRING, [], {}), None, None),
        (None, None, ("f1.parquet", {}, 1, True), None),
    ]
    tmp = os.path.join(d, "__cp_tmp")
    spark.createDataFrame(rows, cp_schema).coalesce(1).write.parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(log_dir, f"{2:020d}.checkpoint.parquet"))
    shutil.rmtree(tmp)
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as fh:
        fh.write(json.dumps({"version": 2, "size": 3}))
    _log(d, 3, _add("f3.parquet"))  # post-checkpoint JSON commit
    assert _ids(read_delta(spark, d)) == [10, 11, 12, 20]


def test_read_delta_multipart_checkpoint(spark, tmp_path):
    """Large tables split checkpoints into N parts
    (%020d.checkpoint.%010d.%010d.parquet) — all parts must be read."""
    d = str(tmp_path / "mp")
    os.makedirs(d)
    _write_datafile(spark, d, "f1.parquet", [1])
    _write_datafile(spark, d, "f2.parquet", [2])
    log_dir = os.path.join(d, "_delta_log")
    os.makedirs(log_dir)
    cp_schema = (
        "protocol struct<minReaderVersion int, minWriterVersion int>, "
        "metaData struct<id string, schemaString string, "
        "partitionColumns array<string>, configuration map<string,string>>, "
        "add struct<path string, partitionValues map<string,string>, "
        "size long, dataChange boolean>, "
        "remove struct<path string>"
    )
    parts = [
        [((1, 2), None, None, None),
         (None, ("u", SCHEMA_STRING, [], {}), None, None),
         (None, None, ("f1.parquet", {}, 1, True), None)],
        [(None, None, ("f2.parquet", {}, 1, True), None)],
    ]
    for i, rows in enumerate(parts):
        tmp = os.path.join(d, f"__cp_tmp{i}")
        spark.createDataFrame(rows, cp_schema).coalesce(1).write.parquet(tmp)
        shutil.move(
            glob.glob(os.path.join(tmp, "part-*.parquet"))[0],
            os.path.join(log_dir,
                         f"{10:020d}.checkpoint.{i + 1:010d}.{len(parts):010d}.parquet"),
        )
        shutil.rmtree(tmp)
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as fh:
        fh.write(json.dumps({"version": 10, "size": 4, "parts": len(parts)}))
    assert _ids(read_delta(spark, d)) == [1, 2]


def test_export_snapshot_roundtrip(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.write(spark.range(5).select(F.col("id"), (F.col("id") * 2).alias("x")))
    t.write(spark.range(3).select(F.col("id"), (F.col("id") * 3).alias("x")))
    dest = str(tmp_path / "export")
    export_snapshot(t, dest, version=0)  # first commit is version 0
    back = spark.read.parquet(dest)
    assert sorted(r.x for r in back.collect()) == [0, 2, 4, 6, 8]
    with open(os.path.join(dest, "_schema.json")) as fh:
        side = json.load(fh)
    assert side["version"] == 0
    assert [f["name"] for f in side["schema"]["fields"]] == ["id", "x"]


def test_convert_delta_to_versioned(spark, delta_dir, tmp_path):
    assert is_delta_dir(spark, delta_dir)
    assert not is_delta_dir(spark, str(tmp_path))
    t = convert_delta_to_versioned(spark, delta_dir, str(tmp_path / "vt2"))
    assert _ids(t.read()) == [10, 11, 12]
    assert t.manifest(0)["operation"] == "CONVERT_FROM_DELTA"


def test_delta_lake_extract_stage_routes_to_bridge(spark, delta_dir):
    """A DeltaLakeExtract stage pointed at a REAL Delta table (not a
    VersionedTable) reads it through the no-jar bridge — the
    reference's notebooks run unchanged against their actual tables."""
    from sql_based_etl_spark.engine.pipeline import Pipeline

    ctx = Pipeline(spark).run([
        {"type": "DeltaLakeExtract", "inputURI": delta_dir,
         "outputView": "dt", "options": {"versionAsOf": 1}},
    ])
    got = sorted(r.id for r in ctx.spark.table("dt").collect())
    assert got == [0, 1, 2, 10, 11, 12]


def test_delta_available_reflects_sandbox():
    # the sandbox ships no delta-spark; the bridge is the tested path
    assert delta_available() is False
