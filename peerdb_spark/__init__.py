"""peerdb_spark — a PySpark-native engine with the query & data-processing
capabilities of PeerDB (reference: PeerDB-io/peerdb, studied read-only).

Architecture (Spark-first, not a port):

- ``types``      — canonical QValue-kind ↔ Spark type mapping (ref: flow/shared/types/kind.go)
- ``registry``   — peers & mirrors as plain metadata (ref: nexus/catalog)
- ``partition``  — QRep partitioners: min/max uniform split, NTILE-balanced
                   (ref: flow/connectors/postgres/qrep_partition.go)
- ``qrep``       — partitioned batch replication engine with APPEND/UPSERT/OVERWRITE
                   write modes and partition-done idempotency (ref: flow/workflows/qrep_flow.go)
- ``cdc``        — change-event model, raw staging table, batch ids
                   (ref: flow/model/record.go, flow/connectors/postgres/client.go)
- ``normalize``  — last-writer-wins dedup + merge into destination tables,
                   soft-delete / synced-at / TOAST-coalesce; eager merge and
                   lazy ReplacingMergeTree-style dedup-on-read view
                   (ref: flow/connectors/postgres/normalize_stmt_generator.go,
                   flow/connectors/clickhouse/normalize_query.go)
- ``streaming``  — Structured Streaming wrapper: file changelog source →
                   foreachBatch(raw append + normalize), checkpointed offsets
- ``functions``  — text analysis, dedup family (exact/minhash/simhash/jaccard),
                   similarity search, multimodal column plumbing — the
                   large-scale training-data-pipeline operator set
- ``sources``    — table loading & synthetic changelog generation helpers

All heavy lifting is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning and join strategy; Python UDFs appear only where semantics require
(multimodal decode stubs).
"""

from peerdb_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
