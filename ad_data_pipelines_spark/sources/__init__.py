"""Readers (parquet/CSV/VDV .x10/Excel/GeoJSON) and sinks (CSV, staged
JDBC, manifest-based incremental import)."""
