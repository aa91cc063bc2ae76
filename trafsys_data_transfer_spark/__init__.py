"""trafsys_data_transfer_spark — a PySpark-native analytics/ETL engine.

A ground-up Spark rebuild of the capabilities of the reference ETL job
``ulsdevteam/trafsys-data-transfer`` (a Node.js script that loads hourly
TrafSys people-counter data into an Oracle table; see
/root/reference/script.js), extended with the large-scale data-pipeline
operators a 100 TB training-data pipeline needs: deduplication families,
similarity search, text analysis, and multimodal column plumbing.

Design stance (Spark-first, not a port):

* Everything is declared through the DataFrame / Spark SQL API so Catalyst
  performs predicate pushdown, column pruning, join selection, and AQE
  re-planning; no hand-scheduled execution.
* The hot path stays JVM-side (builtin ``pyspark.sql.functions``); Python
  appears only in Arrow-batched Pandas UDFs where builtins genuinely cannot
  express the semantics (e.g. multimodal decode stubs).
* Scale posture: partition-on-write by date, broadcast small dimensions,
  MERGE with source-side partition pruning, deterministic salting hooks for
  skewed keys.
"""

__version__ = "0.1.0"
