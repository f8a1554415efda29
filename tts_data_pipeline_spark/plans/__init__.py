from tts_data_pipeline_spark.plans.registry import ORACLES, QUERIES, query  # noqa: F401
