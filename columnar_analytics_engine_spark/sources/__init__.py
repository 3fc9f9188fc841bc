"""Sources & sinks: parquet/CSV/JSON readers, synthetic generators."""
