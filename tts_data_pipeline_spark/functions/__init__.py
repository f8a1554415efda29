from tts_data_pipeline_spark.functions import vi_text  # noqa: F401
