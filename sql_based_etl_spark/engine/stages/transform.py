"""Transform stages: TypingTransform + SQLTransform (SURVEY.md §1, §2d M4)."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sql_based_etl_spark.engine.config import substitute_sql_params
from sql_based_etl_spark.engine.pipeline import PipelineContext, StageError

_TYPE_ALIASES = {
    "integer": "int",
    "long": "bigint",
    "string": "string",
    "boolean": "boolean",
    "double": "double",
    "float": "float",
    "decimal": "decimal(38,18)",
    "date": "date",
    "timestamp": "timestamp",
}


def typing_transform(ctx: PipelineContext, conf: dict) -> DataFrame:
    """Arc-style TypingTransform (scd2-job.ipynb:88-96): apply an
    external schema-as-data file to an untyped (all-string) view.

    Semantics (SURVEY.md §1): columns are mapped *positionally* onto the
    schema entries; values that fail to convert become NULL and the
    failure is recorded per-row in an ``_errors`` array column — the job
    never fails on bad data. Plain ``when()`` expressions; no UDFs.
    """
    df = ctx.view(conf["inputView"])
    if "schema" in conf:
        entries = conf["schema"]
    else:
        with open(conf["schemaURI"]) as f:
            entries = json.load(f)
    if len(df.columns) < len(entries):
        raise StageError(
            f"TypingTransform: view has {len(df.columns)} columns, schema needs {len(entries)}"
        )
    return apply_typing(df, entries)


def apply_typing(df: DataFrame, entries: list[dict]) -> DataFrame:
    """Pure typing core: positional cast of ``df``'s columns onto the
    schema ``entries`` plus the per-row ``_errors`` column."""
    cols = []
    err_entries = []
    for raw_name, entry in zip(df.columns, entries):
        name = entry["name"]
        typ = _TYPE_ALIASES.get(entry.get("type", "string"), entry.get("type", "string"))
        raw = F.col(raw_name)
        # try_cast, not cast: ANSI mode (Spark 4 default) makes cast THROW
        # on malformed input; Arc's contract is NULL + an _errors entry.
        typed = raw.try_cast(typ)
        cols.append(typed.alias(name))
        if typ != "string":
            err_entries.append(
                F.when(
                    raw.isNotNull() & typed.isNull(),
                    F.concat(F.lit(f"{name}: unable to convert '"), raw, F.lit(f"' to {typ}")),
                )
            )
        if not entry.get("nullable", True):
            err_entries.append(
                F.when(raw.isNull(), F.lit(f"{name}: null value for non-nullable field"))
            )
    # Null-dropping must avoid higher-order functions: F.filter lambdas are
    # CodegenFallback, and even F.array_compact is RuntimeReplaceable into
    # filter(..., lambda) — either would drag every CSV-ingest stage out of
    # whole-stage codegen (see tests/test_plans.py no-lambda gate). concat_ws
    # skips nulls natively, so join-then-split on an unlikely delimiter
    # (\x1f unit separator) stays fully codegen'd.
    if err_entries:
        joined = F.concat_ws("\x1f", *err_entries)
        errors = F.when(F.length(joined) == 0, F.array().cast("array<string>")).otherwise(
            F.split(joined, "\x1f")
        )
    else:
        errors = F.array().cast("array<string>")
    return df.select(*cols, errors.alias("_errors"))


def sql_transform(ctx: PipelineContext, conf: dict) -> DataFrame:
    """M4 ``%sql`` / SQLTransform (scd2-job.ipynb:141-145): substitute
    ``sqlParams`` then pipeline/%env variables into the SQL body
    (scd2-job.ipynb:143 uses ``${ETL_CONF_CURRENT_TIMESTAMP}`` from
    %env), run it against the session catalog, return the result."""
    if "sql" in conf:
        sql = conf["sql"]
    else:
        with open(conf["inputURI"]) as f:
            sql = f.read()
    sql = substitute_sql_params(sql, conf.get("sqlParams"))
    sql = substitute_sql_params(sql, ctx.variables)
    try:
        return ctx.spark.sql(sql)
    except Exception as e:  # noqa: BLE001
        # Arc/Spark-3 compat: `int_col = true` (scd2-job.ipynb:313) is a
        # DATATYPE_MISMATCH on Spark 4 — retry once with Spark 3's
        # BooleanEquality literal coercion; surface the ORIGINAL error
        # if the rewrite doesn't fix it (engine/sql_compat.py).
        if "DATATYPE_MISMATCH" in str(e) and "BOOLEAN" in str(e):
            from sql_based_etl_spark.engine.sql_compat import coerce_boolean_equality

            rewritten = coerce_boolean_equality(sql)
            if rewritten != sql:
                try:
                    return ctx.spark.sql(rewritten)
                except Exception:  # noqa: BLE001
                    pass
        raise


def model_score_transform(ctx: PipelineContext, conf: dict) -> DataFrame:
    """``ModelScoreTransform``: apply a small linear model to numeric
    feature columns — ``score = intercept + Σ wᵢ·xᵢ``, optional
    ``label = score ≥ threshold``.

    This is the deployment shape of a distilled pretraining-quality
    classifier (fastText/logreg exported to plain weights): the model
    splices in as literals, so scoring is ONE codegen projection — no
    UDF, no model server, no shuffle; at 100 TB it runs at scan speed.
    The score is the linear term (not the sigmoid): monotone in the
    probability, so thresholding is equivalent, and it stays exactly
    reproducible across engines (``exp`` is last-ulp
    implementation-defined; a sum of products is not).

    conf: ``inputView``; ``model`` {``weights`` {col: w}, ``intercept``,
    ``threshold``, optional ``decimals`` {``weights``, ``features``}}
    inline or ``modelURI`` (JSON file of the same shape);
    ``scoreColumn``/``labelColumn`` names.

    With ``decimals`` given, scoring runs in scaled int64 space
    (weights×10^dw, features×10^df, one double division at the end) —
    bit-reproducible in any engine and immune to decimal-rounding
    half-boundary divergence; without it, plain double arithmetic
    (fine when no cross-engine hash must match)."""
    df = ctx.view(conf["inputView"])
    if "modelURI" in conf:
        import json as _json

        with open(conf["modelURI"]) as f:
            model = _json.load(f)
    else:
        model = conf["model"]
    score_col = conf.get("scoreColumn", "score")
    thr = model.get("threshold")
    dec = model.get("decimals")
    if dec is not None:
        dw, dframe = int(dec["weights"]), int(dec["features"])
        sw, sf_, stot = 10 ** dw, 10 ** dframe, 10 ** (dw + dframe)
        z = F.lit(int(round(float(model.get("intercept", 0.0)) * stot)))
        for c, w in model["weights"].items():
            z = z + F.lit(int(round(float(w) * sw))) * F.round(
                F.col(c).cast("double") * F.lit(float(sf_))
            ).cast("long")
        out = df.withColumn(score_col, z.cast("double") / F.lit(float(stot)))
        if thr is not None:
            out = out.withColumn(
                conf.get("labelColumn", "label"),
                (z >= F.lit(int(round(float(thr) * stot)))).cast("int"),
            )
        return out
    z = F.lit(float(model.get("intercept", 0.0)))
    for c, w in model["weights"].items():
        z = z + F.lit(float(w)) * F.col(c).cast("double")
    out = df.withColumn(score_col, F.round(z, 6))
    if thr is not None:
        out = out.withColumn(
            conf.get("labelColumn", "label"),
            (F.col(score_col) >= F.lit(float(thr))).cast("int"),
        )
    return out
