"""Validate stages: fail-loud data-quality gates between pipeline
stages (Arc's Validate stage family — https://arc.tripl.ai exposes
SQLValidate as the canonical example; the reference notebook's
pipeline, scd2-job.ipynb, is a straight ETL chain, so these are
engine-surface parity plus the expectations shorthand every ETL
pipeline grows).

Both stages AGGREGATE to a verdict rather than collecting rows: at
100 TB a validation is one scan with map-side-combinable counts, and
only the (tiny) failure summary ever reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sql_based_etl_spark.engine.config import substitute_sql_params
from sql_based_etl_spark.engine.pipeline import PipelineContext, StageError


def sql_validate(ctx: PipelineContext, conf: dict) -> DataFrame | None:
    """Arc ``SQLValidate``: run SQL that returns one row
    ``(valid boolean, message string)``; raise on ``valid = false``
    (aborting the pipeline before a bad load propagates).

    The SQL itself is the aggregation — e.g.
    ``SELECT count(*) = 0 AS valid, concat('dupes: ', count(*)) AS
    message FROM (SELECT id FROM v GROUP BY id HAVING count(*) > 1)``.
    """
    if "sql" in conf:
        sql = conf["sql"]
    else:
        with open(conf["inputURI"]) as f:
            sql = f.read()
    sql = substitute_sql_params(sql, conf.get("sqlParams"))
    sql = substitute_sql_params(sql, ctx.variables)
    rows = ctx.spark.sql(sql).collect()
    if len(rows) != 1 or len(rows[0]) < 2:
        raise StageError(
            f"SQLValidate {conf.get('name', '')!r}: validation SQL must "
            f"return exactly one (valid, message) row, got {len(rows)} rows"
        )
    valid, message = bool(rows[0][0]), str(rows[0][1])
    if not valid:
        raise StageError(f"SQLValidate {conf.get('name', '')!r} failed: {message}")
    return None


def expectations_validate(ctx: PipelineContext, conf: dict) -> DataFrame | None:
    """Declarative expectations over a view, all checked in ONE scan:

    conf: ``inputView``; ``expectations`` — a list of
      {"column": c, "notNull": true}
      {"column": c, "unique": true}
      {"column": c, "acceptedValues": [..]}
      {"column": c, "min": x} / {"column": c, "max": x}
      {"expr": "<boolean SQL>"}          (row-level predicate)

    Violation counts aggregate map-side (unique via count - distinct);
    the stage raises with every failed expectation's count, so one run
    reports all problems, not just the first.

    NULL semantics (deliberate, fail-closed): ``unique`` counts
    duplicate NULLs as violations (two NULL keys are two rows a
    downstream merge can't distinguish); an ``expr`` that evaluates to
    NULL counts as a violation (an expectation that can't affirm the
    row has not validated it). ``acceptedValues``/``min``/``max`` pass
    NULLs — pair them with ``notNull`` to reject those. An empty
    expectations list is a config error, not a vacuous pass.
    """
    check_expectations(
        ctx.view(conf["inputView"]), conf.get("expectations"),
        f"ExpectationsValidate {conf.get('name', '')!r}",
    )
    return None


def check_expectations(df: DataFrame, expectations, label: str) -> None:
    """The one-scan expectation audit behind ``ExpectationsValidate``
    (and ``ValidatedLoad``'s post-write gate): raises ``StageError``
    listing EVERY failed expectation's violation count."""
    aggs, labels = compile_expectations(expectations, label)
    row = df.agg(*[a.alias(f"v{i}") for i, a in enumerate(aggs)]).collect()[0]
    failures = [
        f"{labels[i]}: {row[i]} violating rows"
        for i in range(len(labels))
        if (row[i] or 0) > 0
    ]
    if failures:
        raise StageError(f"{label} failed: " + "; ".join(failures))


def compile_expectations(expectations, label: str):
    """Pure config step of :func:`check_expectations`: translate the
    expectations list into aggregate columns + human labels, raising
    ``StageError`` on an empty list or an unrecognized entry WITHOUT
    touching any data. ``ValidatedLoad`` calls this before its write so
    a config typo costs nothing (no junk version + rollback, no
    dangling first-ever table)."""
    if not expectations:
        raise StageError(
            f"{label}: empty "
            "expectations list — a validation that checks nothing is a "
            "config error, not a pass"
        )
    aggs = []
    labels = []
    for i, e in enumerate(expectations):
        c = e.get("column")
        if e.get("notNull"):
            aggs.append(F.sum(F.col(c).isNull().cast("long")))
            labels.append(f"{c} notNull")
        elif e.get("unique"):
            null_dups = F.greatest(
                F.sum(F.col(c).isNull().cast("long")) - F.lit(1), F.lit(0)
            )
            aggs.append(F.count(c) - F.count_distinct(F.col(c)) + null_dups)
            labels.append(f"{c} unique")
        elif "acceptedValues" in e:
            ok = F.col(c).isin(*e["acceptedValues"]) | F.col(c).isNull()
            aggs.append(F.sum((~ok).cast("long")))
            labels.append(f"{c} acceptedValues")
        elif "min" in e or "max" in e:
            bad = F.lit(False)
            if "min" in e:
                bad = bad | (F.col(c) < F.lit(e["min"]))
            if "max" in e:
                bad = bad | (F.col(c) > F.lit(e["max"]))
            aggs.append(F.sum(bad.cast("long")))
            labels.append(f"{c} range")
        elif "expr" in e:
            # coalesce(NOT expr, true): a NULL-valued expectation is a
            # violation, not a free pass
            aggs.append(
                F.sum(F.coalesce(~F.expr(e["expr"]), F.lit(True)).cast("long"))
            )
            labels.append(f"expr[{i}] {e['expr']!r}")
        else:
            raise StageError(f"{label}: unrecognized expectation {e!r}")
    return aggs, labels
