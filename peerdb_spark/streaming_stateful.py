"""Custom stateful streaming operators via applyInPandasWithState.

The reference keeps per-key bookkeeping during CDC pulls: the consumed-offset
cursor and the TOAST backfill cache keyed by primary key
(flow/connectors/utils/cdc_store.go — a pebble-backed KV the pull loop
consults per record). Spark's equivalent primitive for custom keyed state in
a stream is applyInPandasWithState; this module uses it for the one operator
that genuinely needs cross-batch keyed state:

- stateful_dedup_stream: drop change events whose checkpoint id is not newer
  than the highest already seen for their key — exactly-once-per-version
  semantics at the stream level even when the transport redelivers
  (at-least-once feeds: Kafka redelivery, file re-drops). State per key is a
  single int64 (max seen checkpoint) with optional TTL — bounded, tiny, and
  shuffled only by the grouping key.

Scale note: state volume is O(distinct active keys) × 8 bytes. For 100 TB
feeds the state store partitions by key hash across executors; the watermark/
TTL bounds it. This is the only operator in the engine using Spark state —
everything else keeps state in the destination tables themselves.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([T.StructField("max_ckpt", T.LongType())])


def stateful_dedup_stream(
    changelog: DataFrame,
    key_cols: list[str],
    output_schema: T.StructType,
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """Cross-batch per-key redelivery filter for a streaming changelog.

    `changelog` must be a streaming DataFrame containing `_checkpoint_id` and
    the key columns; `output_schema` is the pass-through row schema. Arrow
    batches move the rows; per-key Python work is a vectorized pandas filter.

    The state function is a closure (pickled BY VALUE, not by module
    reference) so Python workers need no peerdb_spark on their import path —
    the engine may be driven from anywhere.
    """

    def dedup_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        max_seen = state.get[0] if state.exists else -1
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("_checkpoint_id")
            fresh = pdf[pdf["_checkpoint_id"] > max_seen]
            if len(fresh):
                max_seen = int(fresh["_checkpoint_id"].max())
                out.append(fresh)
        state.update((max_seen,))
        if out:
            yield _pd.concat(out)

    return changelog.groupBy(*key_cols).applyInPandasWithState(
        dedup_fn,
        outputStructType=output_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
