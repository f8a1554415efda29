from tts_data_pipeline_spark.sinks.writers import (  # noqa: F401
    compact_partitioned_merge,
    merge_into_partitioned,
    read_merged_partitioned,
    write_bucketed_table,
    write_csv,
    write_hf_dataset,
    write_json_records,
    write_lines,
    write_parquet,
    write_partitioned_dataset,
    write_zorder_layout,
    zorder_value,
)
