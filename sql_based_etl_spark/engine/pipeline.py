"""Pipeline runner: ordered execution of typed stages over a named-view
registry — the engine's core abstraction (SURVEY.md §1: every stage
consumes ``inputView`` and/or produces ``outputView``; the notebook's
own tip at scd2-job.ipynb:227 calls views "temp tables").

Lifecycle per stage (SURVEY.md §3): resolve config (P2) → filter by
``environments`` (P1, scd2-job.ipynb:409) → dispatch on ``type`` →
execute one DataFrame chain → register ``outputView``. Stage ``name``
becomes the Spark job description (P4).
"""

from __future__ import annotations

import logging
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from sql_based_etl_spark.engine.config import ConfigError

log = logging.getLogger("sql_based_etl_spark.pipeline")


class StageError(RuntimeError):
    pass


class PipelineContext:
    """Mutable run state: variables (%env), the view registry, and the
    active environment."""

    def __init__(self, spark: SparkSession, environment: str = "dev",
                 variables: dict[str, str] | None = None):
        self.spark = spark
        self.environment = environment
        self.variables: dict[str, str] = dict(variables or {})
        self.views: dict[str, DataFrame] = {}
        self.num_rows_preview = 0  # %conf numRows; 0 = no preview echo

    def register_view(self, name: str, df: DataFrame) -> None:
        df.createOrReplaceTempView(name)
        self.views[name] = df

    def view(self, name: str) -> DataFrame:
        if name in self.views:
            return self.views[name]
        try:
            return self.spark.table(name)
        except Exception as e:  # noqa: BLE001
            raise StageError(f"unknown inputView {name!r}") from e


class Pipeline:
    def __init__(self, spark: SparkSession, environment: str = "dev",
                 variables: dict[str, str] | None = None):
        self.ctx = PipelineContext(spark, environment, variables)

    def run(self, stages: list[dict[str, Any]]) -> PipelineContext:
        """Execute stages in order (the production entry point runs the
        same list a notebook produces — scd2-job-scheduler.yaml:29)."""
        from sql_based_etl_spark.engine.stages import STAGE_TYPES

        for i, stage in enumerate(stages):
            stype = stage.get("type")
            if not stype:
                raise ConfigError(f"stage {i} has no type: {stage}")
            envs = stage.get("environments")
            if envs and self.ctx.environment not in envs:
                log.info("skip stage %s (%s): env %s not in %s",
                         i, stage.get("name"), self.ctx.environment, envs)
                continue
            fn = STAGE_TYPES.get(stype)
            if fn is None:
                raise ConfigError(f"unknown stage type {stype!r}")
            name = stage.get("name", stype)
            self.ctx.spark.sparkContext.setJobDescription(f"{stype}: {name}")
            log.info("run stage %s: %s (%s)", i, name, stype)
            df = fn(self.ctx, stage)
            out = stage.get("outputView")
            if out and df is not None:
                self.ctx.register_view(out, df)
                if self.ctx.num_rows_preview:
                    df.show(self.ctx.num_rows_preview, truncate=False)
        return self.ctx
