"""fupi_spark — a from-scratch PySpark-native lakehouse table-maintenance
engine with the query and data-processing capabilities of ddmitov/fupi.

The reference (/root/reference, read-only) is a ~1,450-line Python
semantic-search system composing DuckDB + LanceDB + ONNX Runtime. This
package re-expresses its data model, query semantics, and
ingest/maintenance semantics Spark-first (see SURVEY.md), and adds the
north-rule maintenance engine: bin-packing compaction, Z-order/Hilbert
clustering, manifest rewrite + stats recomputation, snapshot expiry with
orphan-file GC, and MERGE INTO with copy-on-write — over Iceberg-style
tables of audio clip + transcript pairs.

Nothing here is a port: no code is copied from the reference; every
operator is an idiomatic DataFrame/SQL program, with vectorized
pandas/Arrow UDFs for per-row payload work (never per-row Python).
"""

__version__ = "0.1.0"
