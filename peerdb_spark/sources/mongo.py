"""MongoDB change-stream decoder: change event documents → changelog rows.

The input is the PUBLIC change-stream event shape (MongoDB docs,
"Change Events"): {_id: {_data: <resume token hex>}, operationType,
clusterTime: {$timestamp: {t, i}}, ns: {db, coll}, documentKey,
fullDocument, updateDescription: {updatedFields, removedFields}, ...}.

Reference parity (studied, not copied): flow/connectors/mongo/cdc.go
consumes the same events with fullDocument post-images (updateLookup),
treats the resume token as the (opaque, lexicographically ordered)
checkpoint — the string-offset path of flow/model/cdc_stream.go:56-58 —
maps operationType insert/update/replace/delete onto the record kinds, and
uses documentKey as the delete row image.

Spark realization: pure JVM JSON expressions (get_json_object), no Python —
the decode is columnar and codegen-friendly, unlike the inherently
sequential pgoutput byte stream (pgoutput.py). Resume-token checkpoints are
STRINGS: feed the result through changelog_schema_with_checkpoint(StringType)
pipelines (normalize orders them lexicographically, which is how resume
tokens order)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Envelope scalars decoded with ONE from_json pass (PERMISSIVE mode ignores
# the fields we don't declare). fullDocument/documentKey are NOT in this
# schema on purpose: they are schemaless documents and must round-trip as
# raw JSON text (get_json_object re-renders the subtree, preserving field
# order), not as a fixed struct.
_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StructType([T.StructField("_data", T.StringType())])),
        T.StructField("operationType", T.StringType()),
        T.StructField(
            "clusterTime",
            T.StructType(
                [
                    T.StructField(
                        "$timestamp",
                        T.StructType(
                            [
                                T.StructField("t", T.LongType()),
                                T.StructField("i", T.LongType()),
                            ]
                        ),
                    )
                ]
            ),
        ),
        T.StructField(
            "ns",
            T.StructType(
                [T.StructField("db", T.StringType()), T.StructField("coll", T.StringType())]
            ),
        ),
        T.StructField("txnNumber", T.LongType()),
    ]
)

_KIND = {
    "insert": "insert",
    "update": "update",
    "replace": "update",  # replace is a full-row update (reference maps it so)
    "delete": "delete",
}


def _kind_expr(op: Column) -> Column:
    expr = F.lit(None).cast("string")
    for src, dst in reversed(list(_KIND.items())):
        expr = F.when(op == src, F.lit(dst)).otherwise(expr)
    return expr


def changestream_to_changelog(
    events: DataFrame,
    payload_col: str = "event_json",
    txid_col: str | None = None,
) -> DataFrame:
    """DataFrame with a change-event JSON column → CHANGELOG_SCHEMA-shaped
    rows with STRING checkpoints (resume tokens).

    Unknown operationTypes (drop/rename/invalidate — stream-control events)
    are filtered out, as the reference ignores non-document events.

    Insert/update events with NO fullDocument post-image are also dropped:
    updateLookup can miss (document deleted between event and lookup —
    the reference skips these, mongo cdc.go), and passing a NULL _data
    through would null-out every destination column on merge.
    """
    j = F.col(payload_col)
    # ONE JSON parse for every envelope scalar (from_json; earlier versions
    # issued 7 get_json_object calls, each a full re-parse — and when the
    # payload column is itself a computed expression, Catalyst's filter
    # pushdown inlines it into every call, ~15 serialize+parse per row).
    # Only the schemaless document payloads still go through get_json_object
    # (they must stay raw JSON text with source field order).
    parsed = events.select(
        "*", F.from_json(j, _ENVELOPE_SCHEMA).alias("_env")
    )
    op = F.col("_env.operationType")
    ns = F.concat_ws(".", F.col("_env.ns.db"), F.col("_env.ns.coll"))
    out = parsed.select(
        _kind_expr(op).alias("_kind"),
        F.col("_env._id._data").alias("_checkpoint_id"),
        F.timestamp_seconds(F.col("_env.clusterTime.$timestamp.t")).alias("_commit_ts"),
        (F.col(txid_col) if txid_col else F.col("_env.txnNumber")).alias("_txid"),
        ns.alias("_src_table"),
        ns.alias("_dst_table"),
        # post-image: fullDocument for insert/replace/update(updateLookup)
        F.get_json_object(j, "$.fullDocument").alias("_data"),
        # deletes read the documentKey row image (match data)
        F.get_json_object(j, "$.documentKey").alias("_old_data"),
        F.lit(None).cast("array<string>").alias("_unchanged_cols"),
    )
    return out.where(
        F.col("_kind").isNotNull()
        & ((F.col("_kind") == "delete") | F.col("_data").isNotNull())
    )
