"""Sources & sinks: repo_files ingest, driver testdata, Iceberg/parquet layer."""
