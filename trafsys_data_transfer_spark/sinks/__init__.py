"""Sinks: parquet MERGE (operators.merge) plus Oracle-JDBC parity helpers."""
