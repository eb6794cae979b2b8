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

# Public API (the reference exports HuggingFaceDataset + LanceDBEmbedder,
# fupi/__init__.py:1-2; ours exports the engine surface).
from .meta import Table, create_table, load_table, append, CommitConflict  # noqa: E402,F401
from .compact import compact, ffd_pack  # noqa: E402,F401
from .cluster import cluster  # noqa: E402,F401
from .merge import merge_into  # noqa: E402,F401
from .expire import expire_snapshots, gc_orphans  # noqa: E402,F401
from .synth import synth_clips  # noqa: E402,F401
from .audio import verify_clips, extract_features  # noqa: E402,F401
from .ingest import ingest_corpus  # noqa: E402,F401
from .search import search, translate_results, results_to_records  # noqa: E402,F401
from .cdc import changelog_scan  # noqa: E402,F401
from .bloom import refresh_bloom_index, point_lookup  # noqa: E402,F401
from .transform import transform_payloads  # noqa: E402,F401
from .advisor import advise  # noqa: E402,F401
