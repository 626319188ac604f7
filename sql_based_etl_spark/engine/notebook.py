"""Notebook front-end: execute an Arc-style ``.ipynb`` as a pipeline.

The reference treats notebooks as the deployable job artifact — the
same ``.ipynb`` runs interactively and as a scheduled batch job
(SURVEY.md §3; scd2-job-scheduler.yaml:29,44,60 point ``configUri`` at
notebooks). Cells are either ``%magic`` lines (M1-M4,
scd2-job.ipynb:20,66,131,141) or JSON/HOCON stage configs.

Cells convert to stage dicts executed in order; config cells stay as
raw text until execution so ``%env`` variables defined mid-run resolve
correctly (scd2-job.ipynb:131-132 sets a timestamp used by later
stages).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import SparkSession

from sql_based_etl_spark.engine.config import parse_magic_line, parse_stage_config
from sql_based_etl_spark.engine.pipeline import Pipeline, PipelineContext

# --- magic / raw-config stage implementations -------------------------------


def _env_stage(ctx: PipelineContext, conf: dict) -> None:
    """M3 ``%env K=V`` (scd2-job.ipynb:131-132,263-264): define
    substitution variables for later stages."""
    ctx.variables.update(conf["vars"])
    return None


def _conf_stage(ctx: PipelineContext, conf: dict) -> None:
    """M1 ``%conf`` (scd2-job.ipynb:20-22): session/preview config."""
    if "numRows" in conf:
        ctx.num_rows_preview = int(conf["numRows"])
    return None


def _printschema_stage(ctx: PipelineContext, conf: dict) -> None:
    """M2 ``%printschema <view>`` (scd2-job.ipynb:66-67)."""
    ctx.view(conf["view"]).printSchema()
    return None


def _explain_stage(ctx: PipelineContext, conf: dict) -> None:
    """``%explain <view> [mode]`` — plan introspection from the
    notebook surface (extension; the reference stops at
    %printschema). Prints the view's plan in the given explain mode
    (default ``formatted`` — the scan/pushdown/codegen view the 100 TB
    posture is audited with)."""
    ctx.view(conf["view"]).explain(conf.get("mode", "formatted"))
    return None


def _raw_config_stage(ctx: PipelineContext, conf: dict):
    """A JSON/HOCON stage cell, parsed at execution time against the
    *current* variable map, then dispatched normally.

    Two test/porting facilities (no-ops unless the caller sets them on
    the context via :func:`run_notebook`):

    - ``uri_scheme_map``: prefix rewrites applied to every ``*URI``
      conf value — how a notebook written against ``s3a://`` paths runs
      against local fixtures (prod keeps s3a; only the prefix differs).
    - ``skip_stages``: stage *names* to skip — for stages whose
      external endpoint can't exist in the environment (the reference's
      Athena-catalog JDBCExecute, scd2-job.ipynb:372-384).
    """
    from sql_based_etl_spark.engine.stages import STAGE_TYPES

    stage = parse_stage_config(conf["text"], ctx.variables)
    envs = stage.get("environments")
    if envs and ctx.environment not in envs:
        return None
    if stage.get("name") in getattr(ctx, "skip_stages", ()):
        return None
    for key, val in list(stage.items()):
        if key.endswith("URI") and isinstance(val, str):
            for prefix, repl in getattr(ctx, "uri_scheme_map", {}).items():
                if val.startswith(prefix):
                    stage[key] = repl + val[len(prefix):]
                    break
    fn = STAGE_TYPES.get(stage["type"])
    if fn is None:
        raise ValueError(f"unknown stage type {stage['type']!r}")
    df = fn(ctx, stage)
    out = stage.get("outputView")
    if out is not None and df is not None:
        ctx.register_view(out, df)
    return None


def register_magic_stages() -> None:
    from sql_based_etl_spark.engine.stages import STAGE_TYPES

    STAGE_TYPES.setdefault("EnvStage", _env_stage)
    STAGE_TYPES.setdefault("ConfStage", _conf_stage)
    STAGE_TYPES.setdefault("PrintSchemaStage", _printschema_stage)
    STAGE_TYPES.setdefault("ExplainStage", _explain_stage)
    STAGE_TYPES.setdefault("RawConfigStage", _raw_config_stage)


# --- cell → stage conversion -------------------------------------------------


def cells_to_stages(cells: list[dict[str, Any]]) -> list[dict[str, Any]]:
    stages: list[dict[str, Any]] = []
    for cell in cells:
        if cell.get("cell_type") != "code":
            continue
        src = cell["source"]
        text = "".join(src) if isinstance(src, list) else src
        text = text.strip()
        if not text:
            continue
        if text.startswith("%"):
            first, _, body = text.partition("\n")
            magic, opts, args = parse_magic_line(first)
            # the reference notebook puts %env/%conf args and the
            # %printschema view on the FOLLOWING lines
            # (scd2-job.ipynb:20-22,66-67,131-132) — fold body k=v
            # lines into opts, body bare words into args
            if magic in ("env", "conf", "printschema", "explain"):
                for line in body.splitlines():
                    line = line.strip()
                    if not line:
                        continue
                    k, eq, v = line.partition("=")
                    if eq:
                        opts[k.strip()] = v.strip()
                    else:
                        args.append(line)
            if magic == "env":
                stages.append({"type": "EnvStage", "vars": opts})
            elif magic == "conf":
                stages.append({"type": "ConfStage", **opts})
            elif magic == "printschema":
                view = args[0] if args else opts.get("view", "")
                stages.append({"type": "PrintSchemaStage", "view": view})
            elif magic == "explain":
                view = args[0] if args else opts.get("view", "")
                stage = {"type": "ExplainStage", "view": view}
                if len(args) > 1:
                    stage["mode"] = args[1]
                elif "mode" in opts:
                    stage["mode"] = opts["mode"]
                stages.append(stage)
            elif magic in ("sql", "sqlvalidate"):
                sql_params = {}
                if "sqlParams" in opts:
                    for pair in opts.pop("sqlParams").split(","):
                        k, _, v = pair.partition("=")
                        sql_params[k.strip()] = v.strip()
                stage = {
                    "type": "SQLTransform",
                    "name": opts.get("name", "sql"),
                    "sql": body,
                    "sqlParams": sql_params,
                }
                if "outputView" in opts:
                    stage["outputView"] = opts["outputView"]
                if "environments" in opts:
                    stage["environments"] = opts["environments"].split(",")
                stages.append(stage)
            # unknown magics (%metadata, %summary, …) are ignored
        else:
            stages.append({"type": "RawConfigStage", "text": text})
    return stages


def run_notebook(
    spark: SparkSession,
    path: str,
    environment: str = "dev",
    variables: dict[str, str] | None = None,
    uri_scheme_map: dict[str, str] | None = None,
    skip_stages: set[str] | None = None,
) -> PipelineContext:
    """Entry points 1+2 (SURVEY.md §3): execute an ``.ipynb`` file's
    cells as a pipeline. ``uri_scheme_map``/``skip_stages`` are the
    local-porting facilities documented on :func:`_raw_config_stage`."""
    register_magic_stages()
    with open(path) as f:
        nb = json.load(f)
    stages = cells_to_stages(nb.get("cells", []))
    pipe = Pipeline(spark, environment, variables)
    pipe.ctx.uri_scheme_map = dict(uri_scheme_map or {})
    pipe.ctx.skip_stages = set(skip_stages or ())
    return pipe.run(stages)
