from tts_data_pipeline_spark.sources.readers import (  # noqa: F401
    load_tables,
    read_alignment_tsv,
    read_books_csv,
    read_delimited_urls,
    read_json_records,
    table,
)
