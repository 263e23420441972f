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
    op = F.get_json_object(j, "$.operationType")
    ns = F.concat_ws(
        ".",
        F.get_json_object(j, "$.ns.db"),
        F.get_json_object(j, "$.ns.coll"),
    )
    cluster_secs = F.get_json_object(j, "$.clusterTime.$timestamp.t").cast("long")
    out = events.select(
        _kind_expr(op).alias("_kind"),
        F.get_json_object(j, "$._id._data").alias("_checkpoint_id"),
        F.timestamp_seconds(cluster_secs).alias("_commit_ts"),
        (F.col(txid_col) if txid_col else F.get_json_object(j, "$.txnNumber").cast("long"))
        .alias("_txid"),
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
