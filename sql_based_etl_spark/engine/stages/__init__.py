"""Stage registry: maps config ``type`` strings to implementations.

The reference's stage types (SURVEY.md §2a) are registered under both
their Arc names (DeltaLake*) and engine-native names (VersionedTable*),
so a pipeline written against the reference runs unchanged.
"""

from sql_based_etl_spark.engine.stages.extract import (
    delimited_extract,
    jdbc_extract,
    json_extract,
    orc_extract,
    parquet_extract,
    text_extract,
    versioned_table_changes_extract,
    versioned_table_extract,
)
from sql_based_etl_spark.engine.stages.load import (
    bucketed_table_load,
    file_load,
    incremental_agg_load,
    jdbc_execute,
    jdbc_load,
    sql_execute,
    versioned_table_load,
    versioned_table_maintenance,
    versioned_table_merge_load,
    validated_load,
)
from sql_based_etl_spark.engine.stages.extensions import (
    decontaminate_transform,
    dedup_transform,
    multimodal_transform,
    sampling_transform,
    similarity_search_transform,
    sketch_transform,
    table_profile,
    text_analysis_transform,
)
from sql_based_etl_spark.engine.stages.transform import (
    model_score_transform,
    sql_transform,
    typing_transform,
)
from sql_based_etl_spark.engine.stages.validate import expectations_validate, sql_validate

STAGE_TYPES = {
    # reference surface (Arc names, scd2-job.ipynb:39,88,163,208,338,373,419,462)
    "DelimitedExtract": delimited_extract,
    "TypingTransform": typing_transform,
    "SQLTransform": sql_transform,
    "DeltaLakeLoad": versioned_table_load,
    "DeltaLakeMergeLoad": versioned_table_merge_load,
    "DeltaLakeExtract": versioned_table_extract,
    "JDBCExecute": jdbc_execute,
    "JDBCExtract": jdbc_extract,
    "JDBCLoad": jdbc_load,
    # engine-native names + extensions
    "ParquetExtract": parquet_extract,
    "JSONExtract": json_extract,
    "ORCExtract": orc_extract,
    "TextExtract": text_extract,
    "FileLoad": file_load,
    "BucketedTableLoad": bucketed_table_load,
    "VersionedTableLoad": versioned_table_load,
    "VersionedTableMergeLoad": versioned_table_merge_load,
    "VersionedTableExtract": versioned_table_extract,
    "VersionedTableChangesExtract": versioned_table_changes_extract,
    "VersionedTableMaintenance": versioned_table_maintenance,
    "IncrementalAggLoad": incremental_agg_load,
    "SQLExecute": sql_execute,
    "SQLValidate": sql_validate,
    "ValidatedLoad": validated_load,
    "ExpectationsValidate": expectations_validate,
    # LLM-data-pipeline extension stages
    "ModelScoreTransform": model_score_transform,
    "DedupTransform": dedup_transform,
    "SimilaritySearchTransform": similarity_search_transform,
    "TextAnalysisTransform": text_analysis_transform,
    "DecontaminateTransform": decontaminate_transform,
    "SamplingTransform": sampling_transform,
    "SketchTransform": sketch_transform,
    "MultimodalTransform": multimodal_transform,
    "TableProfile": table_profile,
}
