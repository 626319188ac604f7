"""SCD2 pipeline golden tests — the reference's own correctness
contract (SURVEY.md §5, FIXTURES.md §1-§4):

1. schema correctness after typing
2. id=12 has exactly two versions after the CDC merge (one expired,
   one current with the new state)            (scd2-job.ipynb:198,443-444)
3. expired-record count == 1                  (scd2-job.ipynb:390-392)
4. time travel relativeVersion=-1 shows the pre-merge single version
                                              (scd2-job.ipynb:461-483)
5. NULL-mergeKey routing + checksum gating semantics
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from sql_based_etl_spark.engine.notebook import run_notebook
from sql_based_etl_spark.engine.pipeline import Pipeline

TS1 = "TIMESTAMP '2024-01-01 00:00:00'"
TS2 = "TIMESTAMP '2024-02-01 00:00:00'"

CALC_SQL = """
SELECT id, name, email, state,
       ${current_ts} AS valid_from,
       CAST(null AS timestamp) AS valid_to,
       1 AS iscurrent,
       md5(concat(name, email, state)) AS checksum
FROM ${table_name}
"""

STAGE_SQL = """
SELECT NULL AS mergeKey, new.*
FROM current_snapshot old
INNER JOIN cdc_calc new ON old.id = new.id
WHERE old.iscurrent = 1 AND old.checksum <> new.checksum
UNION
SELECT id AS mergeKey, * FROM cdc_calc
"""


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("contacts")
    initial = [f"{i},Person {i},p{i}@example.com,{st}" for i, st in
               zip(range(1, 13), ["CA", "NY", "TX", "WA", "OR", "FL", "GA", "IL", "MI", "OH", "PA", "WA"])]
    (d / "initial_contacts.csv").write_text("\n".join(initial) + "\n")
    updates = [
        "12,Person 12,p12@example.com,NY",   # changed state (the golden row)
        "5,Person 5,p5@example.com,OR",      # byte-identical → unchanged path
        "13,Person 13,p13@example.com,NM",   # brand-new id
        "14,Person 14,p14@example.com,AZ",   # brand-new id
    ]
    (d / "update_contacts.csv").write_text("\n".join(updates) + "\n")
    (d / "contact_meta_0.json").write_text(json.dumps([
        {"name": "id", "type": "integer", "nullable": False},
        {"name": "name", "type": "string", "nullable": True},
        {"name": "email", "type": "string", "nullable": True},
        {"name": "state", "type": "string", "nullable": True},
    ]))
    return d


def scd2_stages(fixture_dir, table_dir):
    return [
        {"type": "DelimitedExtract", "name": "extract initial", "environments": ["dev", "test"],
         "inputURI": str(fixture_dir / "initial_contacts.csv"), "outputView": "initial_raw",
         "delimiter": "Comma", "header": False, "quote": "None"},
        {"type": "TypingTransform", "name": "type initial", "environments": ["dev", "test"],
         "schemaURI": str(fixture_dir / "contact_meta_0.json"),
         "inputView": "initial_raw", "outputView": "initial_typed"},
        {"type": "SQLTransform", "name": "calc initial", "environments": ["dev", "test"],
         "sql": CALC_SQL, "outputView": "initial_load",
         "sqlParams": {"table_name": "initial_typed", "current_ts": TS1}},
        {"type": "DeltaLakeLoad", "name": "initial load", "environments": ["dev", "test"],
         "inputView": "initial_load", "outputURI": str(table_dir), "numPartitions": 2},
        # stage that must be SKIPPED (uat sentinel, scd2-job.ipynb:409)
        {"type": "SQLTransform", "name": "validation-only", "environments": ["uat"],
         "sql": "SELECT * FROM nonexistent_view_would_fail", "outputView": "never_created"},
        {"type": "DelimitedExtract", "name": "extract cdc", "environments": ["dev", "test"],
         "inputURI": str(fixture_dir / "update_contacts.csv"), "outputView": "update_raw",
         "delimiter": "Comma", "header": False, "quote": "None"},
        {"type": "TypingTransform", "name": "type cdc", "environments": ["dev", "test"],
         "schemaURI": str(fixture_dir / "contact_meta_0.json"),
         "inputView": "update_raw", "outputView": "cdc_typed"},
        {"type": "SQLTransform", "name": "calc cdc", "environments": ["dev", "test"],
         "sql": CALC_SQL, "outputView": "cdc_calc",
         "sqlParams": {"table_name": "cdc_typed", "current_ts": TS2}},
        # dependsOn pins the snapshot read between the initial load and the
        # merge (the table URI is written twice; the graph alone can't
        # order a reader against sequential states — same resolution as
        # the reference's Argo dependencies, scd2-job-scheduler.yaml:47-48)
        {"type": "DeltaLakeExtract", "name": "read current", "environments": ["dev", "test"],
         "inputURI": str(table_dir), "outputView": "current_snapshot",
         "dependsOn": ["initial load"]},
        {"type": "SQLTransform", "name": "stage updates", "environments": ["dev", "test"],
         "sql": STAGE_SQL, "outputView": "staged_update"},
        {"type": "DeltaLakeMergeLoad", "name": "scd2 merge", "environments": ["dev", "test"],
         "inputView": "staged_update", "outputURI": str(table_dir), "numPartitions": 2,
         "condition": "source.mergeKey = target.id",
         "validateUniqueMatch": True,
         "whenMatchedUpdate": {
             "condition": "target.iscurrent = 1 AND source.checksum <> target.checksum",
             "values": {"valid_to": TS2, "iscurrent": "false"},
         },
         "whenNotMatchedByTargetInsert": {}},
        {"type": "DeltaLakeExtract", "name": "read merged", "environments": ["dev", "test"],
         "inputURI": str(table_dir), "outputView": "contact"},
    ]


def assert_goldens(spark, table_dir):
    contact = spark.table("contact")
    # golden 2: id=12 → exactly one expired + one current row
    rows = {(r.state, r.iscurrent, r.valid_to is not None)
            for r in contact.filter(F.col("id") == 12).collect()}
    assert rows == {("WA", 0, True), ("NY", 1, False)}
    # golden 3: the challenge question — expired count == 1
    assert contact.filter(F.col("iscurrent") == 0).count() == 1
    # total rows: 12 initial + 1 new version + 2 new ids
    assert contact.count() == 15
    # unchanged row kept original valid_from
    r5 = contact.filter(F.col("id") == 5).collect()
    assert len(r5) == 1 and str(r5[0].valid_from) == "2024-01-01 00:00:00"
    # golden 4: time travel to pre-merge version
    from sql_based_etl_spark.tables.versioned import VersionedTable

    t = VersionedTable(spark, str(table_dir))
    pre = t.read(relative_version=-1)
    assert pre.filter(F.col("id") == 12).count() == 1
    assert pre.count() == 12
    assert t.latest_version() == 1


def test_scd2_stage_list(spark, fixture_dir, tmp_path):
    table_dir = tmp_path / "contact_table"
    ctx = Pipeline(spark, environment="dev").run(scd2_stages(fixture_dir, table_dir))
    # golden 1: typing produced the declared schema (+ _errors)
    typed = ctx.views["initial_typed"]
    assert [f.name for f in typed.schema] == ["id", "name", "email", "state", "_errors"]
    assert dict(typed.dtypes)["id"] == "int"
    # environments filter: uat-only stage skipped
    assert "never_created" not in ctx.views
    assert_goldens(spark, table_dir)


def test_scd2_stage_list_on_bridge_delta_table(spark, fixture_dir, tmp_path):
    """VERDICT r6 ask #1 done-criterion: the FULL SCD2 pipeline
    (initial load → CDC extract → MERGE → time travel) runs entirely
    against a bridge-format Delta table (`_delta_log`, no jars) — the
    same stage list as the VersionedTable run, with only
    options.protocol=delta on the load; DeltaLakeMergeLoad routes to
    merge_delta via the `_delta_log` sniff and the goldens match."""
    import glob

    from sql_based_etl_spark.tables.delta_interop import read_delta

    table_dir = tmp_path / "contact_delta"
    stages = scd2_stages(fixture_dir, table_dir)
    for st in stages:
        if st["type"] == "DeltaLakeLoad":
            st["options"] = {"protocol": "delta"}
    Pipeline(spark, environment="dev").run(stages)
    assert os.path.isdir(table_dir / "_delta_log")

    contact = spark.table("contact")
    rows = {(r.state, r.iscurrent, r.valid_to is not None)
            for r in contact.filter(F.col("id") == 12).collect()}
    assert rows == {("WA", 0, True), ("NY", 1, False)}
    assert contact.filter(F.col("iscurrent") == 0).count() == 1
    assert contact.count() == 15
    r5 = contact.filter(F.col("id") == 5).collect()
    assert len(r5) == 1 and str(r5[0].valid_from) == "2024-01-01 00:00:00"
    # golden 4: time travel to the pre-merge version through the bridge
    pre = read_delta(spark, str(table_dir), version=0)
    assert pre.filter(F.col("id") == 12).count() == 1
    assert pre.count() == 12
    # copy-on-write granularity: the merge commit (v1) removed only the
    # matched file(s) — the initial load wrote 2 files and exactly the
    # one holding id=12 was rewritten, the other carried by reference
    log = sorted(glob.glob(str(table_dir / "_delta_log" / "*.json")))
    assert len(log) == 2
    with open(log[1]) as f:
        actions = [json.loads(x) for x in f.read().splitlines() if x.strip()]
    removes = [a for a in actions if "remove" in a]
    adds = [a for a in actions if "add" in a]
    assert len(removes) == 1 and len(adds) >= 1
    assert any(a["commitInfo"]["operation"] == "MERGE"
               for a in actions if "commitInfo" in a)


def test_scd2_notebook(spark, fixture_dir, tmp_path):
    """Same pipeline via the .ipynb front-end with %env/%sql magics and
    HOCON ${VAR} splicing (entry-point 1/2 parity, SURVEY.md §3)."""
    table_dir = tmp_path / "contact_table_nb"
    cells = [
        {"cell_type": "markdown", "source": "# SCD2 demo"},
        {"cell_type": "code", "source": "%conf numRows=0"},
        {"cell_type": "code", "source": f'%env ETL_CONF_DATALAKE_LOC={fixture_dir} ETL_CONF_TABLE_LOC={table_dir} "ETL_CONF_CURRENT_TIMESTAMP={TS1}"'},
        {"cell_type": "code", "source": json.dumps({
            "type": "DelimitedExtract", "name": "extract initial",
            "inputURI": "${ETL_CONF_DATALAKE_LOC}/initial_contacts.csv",
            "outputView": "initial_raw", "header": False, "quote": "None"})},
        {"cell_type": "code", "source": json.dumps({
            "type": "TypingTransform", "name": "type initial",
            "schemaURI": "${ETL_CONF_DATALAKE_LOC}/contact_meta_0.json",
            "inputView": "initial_raw", "outputView": "initial_typed"})},
        {"cell_type": "code", "source": "%printschema initial_typed"},
        {"cell_type": "code",
         "source": "%sql outputView=initial_load name=calc sqlParams=table_name=initial_typed\n"
                   + CALC_SQL.replace("${current_ts}", "${ETL_CONF_CURRENT_TIMESTAMP}")},
        {"cell_type": "code", "source": json.dumps({
            "type": "DeltaLakeLoad", "name": "initial load", "inputView": "initial_load",
            "outputURI": "${ETL_CONF_TABLE_LOC}", "numPartitions": 2})},
        {"cell_type": "code", "source": f'%env "ETL_CONF_CURRENT_TIMESTAMP={TS2}"'},
        {"cell_type": "code", "source": json.dumps({
            "type": "DelimitedExtract", "name": "extract cdc",
            "inputURI": "${ETL_CONF_DATALAKE_LOC}/update_contacts.csv",
            "outputView": "update_raw", "header": False, "quote": "None"})},
        {"cell_type": "code", "source": json.dumps({
            "type": "TypingTransform", "name": "type cdc",
            "schemaURI": "${ETL_CONF_DATALAKE_LOC}/contact_meta_0.json",
            "inputView": "update_raw", "outputView": "cdc_typed"})},
        {"cell_type": "code",
         "source": "%sql outputView=cdc_calc name=calc-cdc sqlParams=table_name=cdc_typed\n"
                   + CALC_SQL.replace("${current_ts}", "${ETL_CONF_CURRENT_TIMESTAMP}")},
        {"cell_type": "code", "source": json.dumps({
            "type": "DeltaLakeExtract", "name": "read current",
            "inputURI": "${ETL_CONF_TABLE_LOC}", "outputView": "current_snapshot"})},
        {"cell_type": "code", "source": "%sql outputView=staged_update name=stage\n" + STAGE_SQL},
        {"cell_type": "code", "source": json.dumps({
            "type": "DeltaLakeMergeLoad", "name": "merge", "inputView": "staged_update",
            "outputURI": "${ETL_CONF_TABLE_LOC}", "numPartitions": 2,
            "condition": "source.mergeKey = target.id",
            "whenMatchedUpdate": {
                "condition": "target.iscurrent = 1 AND source.checksum <> target.checksum",
                "values": {"valid_to": "${ETL_CONF_CURRENT_TIMESTAMP}", "iscurrent": "false"}},
            "whenNotMatchedByTargetInsert": {}})},
        {"cell_type": "code", "source": json.dumps({
            "type": "DeltaLakeExtract", "name": "read merged",
            "inputURI": "${ETL_CONF_TABLE_LOC}", "outputView": "contact"})},
        # uat-only validation cell must be skipped (scd2-job.ipynb:409)
        {"cell_type": "code",
         "source": "%sql outputView=never name=val environments=uat\nSELECT * FROM no_such_view"},
    ]
    nb_path = tmp_path / "scd2_job.ipynb"
    nb_path.write_text(json.dumps({"cells": cells, "nbformat": 4, "nbformat_minor": 5, "metadata": {}}))
    ctx = run_notebook(spark, str(nb_path), environment="dev")
    assert "never" not in ctx.views
    assert_goldens(spark, table_dir)


def test_typing_transform_error_rows(spark, fixture_dir, tmp_path):
    """Arc semantics: untypable cells → NULL + _errors entry, job does
    not fail (SURVEY.md §1 'collect per-row conversion failures')."""
    bad = tmp_path / "bad.csv"
    bad.write_text(
        "abc,Person X,px@example.com,CA\n"
        "7,Person 7,p7@example.com,TX\n"
        ",Person Y,py@example.com,OR\n"
    )
    stages = [
        {"type": "DelimitedExtract", "inputURI": str(bad), "outputView": "bad_raw",
         "header": False, "quote": "None"},
        {"type": "TypingTransform", "schemaURI": str(fixture_dir / "contact_meta_0.json"),
         "inputView": "bad_raw", "outputView": "bad_typed"},
    ]
    ctx = Pipeline(spark).run(stages)
    rows = {r.name: (r.id, list(r._errors)) for r in ctx.views["bad_typed"].collect()}
    assert rows["Person 7"] == (7, [])
    bad_id, errs = rows["Person X"]
    assert bad_id is None and len(errs) == 1 and "unable to convert" in errs[0]
    null_id, errs_y = rows["Person Y"]
    assert null_id is None and errs_y == ["id: null value for non-nullable field"]


def test_merge_null_key_routing(spark, tmp_path):
    """R9: NULL merge keys never match → always insert (the core SCD2
    idiom, scd2-job.ipynb:298,309)."""
    from sql_based_etl_spark.tables.versioned import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "nullkey"))
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string"))
    src = spark.createDataFrame([(None, "a2"), (None, "b2")], "mergeKey int, v string")
    src = src.withColumn("id", F.lit(99))
    t.merge(src, condition="source.mergeKey = target.id",
            when_matched_update={"v": "source.v"}, insert_not_matched=True)
    assert t.read().count() == 4  # both NULL-key rows inserted, none matched


def test_versioned_table_history_and_append(spark, tmp_path):
    from sql_based_etl_spark.tables.versioned import VersionedTable, VersionedTableError

    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.write(spark.createDataFrame([(1,)], "a int"))
    t.write(spark.createDataFrame([(2,)], "a int"), mode="append")
    assert t.read().count() == 2
    assert t.read(version=0).count() == 1
    assert [h["version"] for h in t.history()] == [1, 0]
    with pytest.raises(VersionedTableError):
        t.read(relative_version=-5)


def test_scd2_dag_runner_reorders_unordered_stages(spark, fixture_dir, tmp_path):
    """P6 DAG execution (scd2-job-scheduler.yaml:47-48): the same SCD2
    pipeline given as a deliberately scrambled stage list must
    topologically re-order (extract -> typing -> calc -> load -> stage
    -> merge) and produce the identical golden state."""
    import random

    table_dir = str(tmp_path / "contact_dag")
    stages = scd2_stages(fixture_dir, table_dir)
    scrambled = list(stages)
    random.Random(7).shuffle(scrambled)
    assert [s.get("name") for s in scrambled] != [s.get("name") for s in stages]
    Pipeline(spark, environment="dev").run_dag(scrambled)
    assert_goldens(spark, table_dir)


def test_dag_explicit_depends_on_and_cycle_detection(spark):
    from sql_based_etl_spark.engine.config import ConfigError

    # dependsOn forces an order the graph can't infer
    order = Pipeline._topo_order([
        {"name": "b", "type": "SQLTransform", "sql": "SELECT 1", "outputView": "vb",
         "dependsOn": ["a"]},
        {"name": "a", "type": "SQLTransform", "sql": "SELECT 1", "outputView": "va"},
    ])
    assert order == [1, 0]
    # an ordered list round-trips unchanged (position tie-break)
    assert Pipeline._topo_order([
        {"name": "x", "type": "SQLTransform", "sql": "SELECT 1", "outputView": "v1"},
        {"name": "y", "type": "SQLTransform", "sql": "SELECT * FROM v1", "outputView": "v2"},
        {"name": "z", "type": "SQLTransform", "sql": "SELECT 1", "outputView": "v3"},
    ]) == [0, 1, 2]
    with pytest.raises(ConfigError, match="cycle"):
        Pipeline._topo_order([
            {"name": "a", "type": "SQLTransform", "sql": "SELECT * FROM v2", "outputView": "v1"},
            {"name": "b", "type": "SQLTransform", "sql": "SELECT * FROM v1", "outputView": "v2"},
        ])


def test_text_extract_wordcount_pipeline(spark, tmp_path):
    """TextExtract -> SQLTransform wordcount — the native job's shape
    (native-spark-job-scheduler.yaml) through the declarative surface."""
    src = tmp_path / "lines.txt"
    src.write_text("alpha beta alpha\nbeta alpha\n")
    ctx = Pipeline(spark).run([
        {"type": "TextExtract", "inputURI": str(src), "outputView": "lines"},
        {"type": "SQLTransform", "outputView": "wc", "sql": """
            SELECT word, count(*) AS n
            FROM (SELECT explode(split(value, ' ')) AS word FROM lines)
            GROUP BY word"""},
    ])
    counts = {r.word: r.n for r in ctx.views["wc"].collect()}
    assert counts == {"alpha": 3, "beta": 2}


REFERENCE_NB = "/root/reference/example/notebook/scd2-job.ipynb"

# The student answer to the notebook's deliberate fill-in-the-blank cell
# (scd2-job.ipynb cell "2.1 Apply Data Type (build your transformation
# here)" — its source is literally `?????????`): a TypingTransform
# mirroring the initial-load one (cell 1.3) with the CDC views, exactly
# what the tutorial instructs.
FILL_IN_CELL = """
{
  "type": "TypingTransform",
  "name": "apply table schema to CDC CSV",
  "environments": ["dev", "test"],
  "schemaURI": "s3a://"${ETL_CONF_DATALAKE_LOC}"/app_code/meta/contact_meta_0.json",
  "inputView": "cdc_raw",
  "outputView": "cdc_typed",
  "authentication": {
     "method": "AmazonIAM"
  }
}
"""


@pytest.mark.skipif(not os.path.exists(REFERENCE_NB), reason="reference snapshot absent")
def test_reference_notebook_runs_unchanged(spark, fixture_dir, tmp_path):
    """THE parity proof: the reference's own scd2-job.ipynb executes
    through the engine with only
      (a) its fill-in-the-blank tutorial cell completed (FILL_IN_CELL),
      (b) s3a:// URIs remapped to the local fixture tree, and
      (c) the Athena-catalog JDBCExecute skipped by name (no Athena
          endpoint here; the JDBC path has its own Derby smoke test) —
    then the uat pass answers the notebook's own validation queries
    (id=12 current+expired, time travel to the pre-merge version)."""
    import shutil

    # fixture tree in the notebook's expected app_code layout
    base = tmp_path / "lake"
    (base / "app_code" / "data").mkdir(parents=True)
    (base / "app_code" / "meta").mkdir(parents=True)
    for f in ("initial_contacts.csv", "update_contacts.csv"):
        shutil.copy(fixture_dir / f, base / "app_code" / "data" / f)
    shutil.copy(fixture_dir / "contact_meta_0.json",
                base / "app_code" / "meta" / "contact_meta_0.json")

    nb = json.loads(open(REFERENCE_NB).read())
    filled = 0
    for cell in nb["cells"]:
        src = "".join(cell["source"]) if isinstance(cell["source"], list) else cell["source"]
        if cell["cell_type"] == "code" and "?????????" in src:
            cell["source"] = FILL_IN_CELL
            filled += 1
    assert filled == 1  # exactly the tutorial's blank
    nb_path = tmp_path / "scd2-job.ipynb"
    nb_path.write_text(json.dumps(nb))

    common = dict(
        variables={"ETL_CONF_DATALAKE_LOC": str(base), "AWS_DEFAULT_REGION": "local"},
        uri_scheme_map={"s3a://": ""},
        skip_stages={"Create glue data catalog"},
    )
    run_notebook(spark, str(nb_path), environment="dev", **common)

    table_dir = base / "app_code" / "output" / "contact"
    from sql_based_etl_spark.tables.versioned import VersionedTable

    t = VersionedTable(spark, str(table_dir))
    merged = t.read()
    # the notebook's goldens (timestamps are current_timestamp() here,
    # so only structural assertions apply)
    rows = {(r.state, bool(r.iscurrent), r.valid_to is not None)
            for r in merged.filter(F.col("id") == 12).collect()}
    assert rows == {("WA", False, True), ("NY", True, False)}
    assert merged.filter(~F.col("iscurrent").cast("boolean")).count() == 1
    assert merged.count() == 15
    assert t.latest_version() == 1

    # uat pass: the notebook's own validation + time-travel cells
    ctx = run_notebook(spark, str(nb_path), environment="uat", **common)
    v12 = ctx.views["validate_type2"].collect()
    assert {bool(r.iscurrent) for r in v12} == {True, False}
    tt = ctx.views["tt_validation"].collect()
    assert len(tt) == 1 and tt[0].state == "WA"  # pre-merge snapshot


def test_scheduled_job_notebooks(spark, fixture_dir, tmp_path):
    """The Argo DAG's three-job flow (scd2-job-scheduler.yaml:17-64):
    initial-load and delta-load run as independent jobs (separate
    pipeline contexts — the CDC batch hands off through storage),
    SCD2-merge runs after both, and the merged table matches the
    interactive notebook's goldens exactly (fixed per-run timestamps,
    as the scheduler's parameter injection implies)."""
    import shutil

    base = tmp_path / "lake"
    (base / "app_code" / "data").mkdir(parents=True)
    (base / "app_code" / "meta").mkdir(parents=True)
    for f in ("initial_contacts.csv", "update_contacts.csv"):
        shutil.copy(fixture_dir / f, base / "app_code" / "data" / f)
    shutil.copy(fixture_dir / "contact_meta_0.json",
                base / "app_code" / "meta" / "contact_meta_0.json")

    jobs = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "examples", "app_code", "job")

    def run_job(name, ts):
        return run_notebook(
            spark, os.path.join(jobs, name),
            variables={"ETL_CONF_DATALAKE_LOC": str(base),
                       "ETL_CONF_CURRENT_TIMESTAMP": ts},
            uri_scheme_map={"s3a://": ""},
        )

    run_job("initial_load.ipynb", TS1)
    run_job("delta_load.ipynb", TS2)
    run_job("scd2_merge.ipynb", TS2)

    from sql_based_etl_spark.tables.versioned import VersionedTable

    t = VersionedTable(spark, str(base / "app_code" / "output" / "contact"))
    merged = t.read()
    merged.createOrReplaceTempView("contact")
    assert_goldens(spark, str(base / "app_code" / "output" / "contact"))


def test_training_data_prep_notebook(spark, tmp_path):
    """The LLM-corpus example notebook runs unchanged end-to-end:
    quality gate -> PII scrub -> exact dedup -> model score ->
    versioned load, with row counts shrinking monotonically at each
    filter and the final table committed."""
    from sql_based_etl_spark.engine.notebook import run_notebook
    from sql_based_etl_spark.tables.versioned import VersionedTable

    ctx = run_notebook(
        spark,
        "examples/app_code/job/training_data_prep.ipynb",
        environment="dev",
        variables={
            "ETL_CONF_TESTDATA_LOC": "/root/testdata/sf0.001",
            "ETL_CONF_OUTPUT_LOC": str(tmp_path),
        },
    )
    # persist every consulted view before the count cascade (r14): the
    # views form one deep lazy chain, so counting them shallow-to-deep
    # otherwise recomputes each upstream segment once PER count —
    # O(depth²) work that made this the suite's slowest file. Caching
    # changes nothing about what is asserted; CacheManager substitutes
    # the cached fragments into every later count's plan.
    _cached = [
        "docs_raw", "docs_throttled", "docs_quality", "docs_unique",
        "docs_canonical", "docs_decontaminated", "docs_prepped",
        "docs_mixed", "docs_split",
    ]
    for _v in _cached:
        ctx.views[_v] = ctx.views[_v].persist()
    n_raw = ctx.views["docs_raw"].count()
    n_throttled = ctx.views["docs_throttled"].count()
    n_quality = ctx.views["docs_quality"].count()
    n_unique = ctx.views["docs_unique"].count()
    assert 0 < n_throttled <= n_raw
    assert 0 < n_quality <= n_throttled
    assert 0 < n_unique <= n_quality
    # near-dup collapse keeps one survivor per cluster + singletons
    n_canonical = ctx.views["docs_canonical"].count()
    assert 0 < n_canonical <= n_unique
    # decontamination only ever removes docs; trimming preserves count
    n_decon = ctx.views["docs_decontaminated"].count()
    assert 0 < n_decon <= n_canonical
    assert ctx.views["docs_prepped"].count() == n_decon
    scored = ctx.views["docs_scored"]
    assert {"doc_id", "text", "lang", "model_score", "keep"} <= set(scored.columns)
    # the mixture emits ≥1 copy per doc at these ≥1.0 weights, with
    # en up-sampled — strictly more rows than docs, deterministic
    n_mixed = ctx.views["docs_mixed"].count()
    assert n_mixed > n_decon
    t = VersionedTable(spark, str(tmp_path / "training_docs"))
    assert t.read().count() == n_mixed
    # corpus diagnostics: skew report, KMV cardinality, length quantiles
    skew = ctx.views["source_skew"].collect()
    assert len(skew) == 5 and all(r.skew_factor >= 0 for r in skew)
    card = ctx.views["corpus_card"].collect()[0]
    assert card.distinct_est > 0
    lq = {r.q: r.value_est for r in ctx.views["len_quantiles"].collect()}
    assert set(lq) == {0.5, 0.9} and 0 < lq[0.5] <= lq[0.9] <= 600
    # leakage-safe split covers every prepped doc with a named split
    split = ctx.views["docs_split"]
    assert split.count() == ctx.views["docs_prepped"].count()
    assert {r.split for r in split.select("split").distinct().collect()} <= {
        "train", "val", "test"
    }
    for _v in _cached:
        ctx.views[_v].unpersist()


def test_embedding_curation_notebook(spark, tmp_path):
    """The vector-corpus example notebook runs unchanged end-to-end:
    label-noise triage -> semantic dedup -> PCA projection -> ANN
    sanity -> versioned load."""
    from sql_based_etl_spark.engine.notebook import run_notebook
    from sql_based_etl_spark.tables.versioned import VersionedTable

    ctx = run_notebook(
        spark,
        "examples/app_code/job/embedding_curation.ipynb",
        environment="dev",
        variables={
            "ETL_CONF_TESTDATA_LOC": "/root/testdata/sf0.001",
            "ETL_CONF_OUTPUT_LOC": str(tmp_path),
        },
    )
    # persist consulted views before counting (see
    # test_training_data_prep_notebook — avoids O(depth²) recompute)
    _cached = ["embs", "emb_clean", "noisy_labels", "emb_pca", "ann_check"]
    for _v in _cached:
        ctx.views[_v] = ctx.views[_v].persist()
    n_raw = ctx.views["embs"].count()
    n_clean = ctx.views["emb_clean"].count()
    n_noisy = ctx.views["noisy_labels"].count()
    assert n_noisy > 0 and 0 < n_clean < n_raw
    # PCA rows = clean vectors x 8 components, ANN returns <=3 per query
    assert ctx.views["emb_pca"].count() == n_clean * 8
    ann = ctx.views["ann_check"]
    assert ann.groupBy("query_id").count().agg({"count": "max"}).collect()[0][0] <= 3
    t = VersionedTable(spark, str(tmp_path / "clean_embeddings"))
    assert t.read().count() == n_clean
    for _v in _cached:
        ctx.views[_v].unpersist()


def test_scd2_dag_parallel_execution(spark, fixture_dir, tmp_path):
    """run_dag(max_parallel=3) executes independent branches from
    driver-side threads — the Argo DAG's parallel initial-load /
    delta-load shape — and lands the exact same goldens as the
    sequential order (engine/pipeline.py:run_dag)."""
    import random

    table_dir = tmp_path / "contact_table_par"
    stages = scd2_stages(fixture_dir, table_dir)
    shuffled = stages[:]
    random.Random(7).shuffle(shuffled)  # order must not matter
    ctx = Pipeline(spark, environment="dev").run_dag(shuffled, max_parallel=3)
    assert "never_created" not in ctx.views  # env filter still applies
    assert_goldens(spark, table_dir)


def test_dag_duplicate_output_view_producers_are_chained(spark):
    """Two stages writing the SAME outputView must not race under
    max_parallel>1: createOrReplaceTempView is last-writer-wins, so the
    graph chains duplicate producers in list order and a consumer sees
    the later producer's data — identical to serial run() semantics
    (engine/pipeline.py:_stage_deps)."""
    stages = [
        {"name": "p1", "type": "SQLTransform", "outputView": "dupv",
         "sql": "SELECT 1 AS x"},
        {"name": "p2", "type": "SQLTransform", "outputView": "dupv",
         "sql": "SELECT 2 AS x"},
        {"name": "c", "type": "SQLTransform", "outputView": "dup_out",
         "sql": "SELECT max(x) AS x FROM dupv"},
    ]
    deps = Pipeline._stage_deps(stages)
    assert 0 in deps[1]          # p2 ordered after p1, not concurrent
    assert deps[2] >= {0, 1}     # consumer waits for the final writer
    for _ in range(3):  # would be flaky, not deterministic, if racing
        ctx = Pipeline(spark).run_dag(stages, max_parallel=3)
        assert ctx.views["dup_out"].collect()[0].x == 2
