"""Input sources: parquet / directory-of-files (binaryFile) / Iceberg-gated."""
