from dynamic_etl_spark.pipelines.retail import (  # noqa: F401
    dw_load_pipeline,
    extract_pipeline,
    generation_pipeline,
    production_thresholds,
    retail_daily_run,
    validation_pipeline,
)
