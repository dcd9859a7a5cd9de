"""Source connectors beyond the interleaved-docs parquet scan."""
