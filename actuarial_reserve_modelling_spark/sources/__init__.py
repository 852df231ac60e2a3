"""Sources and sinks (SURVEY §2.1): CSV/parquet scans live in
``catalog``; this package holds the write-side surface."""
