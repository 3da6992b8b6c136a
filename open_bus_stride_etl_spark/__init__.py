"""open_bus_stride_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the query and data-processing capabilities of
``hasadna/open-bus-stride-etl`` (reference studied at /root/reference),
re-expressed Spark-first: declarative DataFrame plans optimized by
Catalyst instead of templated SQL delegated to PostgreSQL.

Layers
------
- ``sources``    — lake readers/writers, schema registry, CSV datapackage sink
- ``functions``  — scalar column expressions (geo, time, text, hashing)
- ``operators``  — generic ``DataFrame -> DataFrame`` operators implementing
                   the reference's query semantics (SURVEY.md §2)
- ``plans``      — composed task plans (the reference's ETL tasks)
- ``streaming``  — Structured Streaming variants of the incremental tasks
"""

__version__ = "0.1.0"
