"""Custom stateful streaming operator: cross-batch dedup-by-key.

The reference achieves idempotent redelivery by keying every indexed doc on
``IR_SID`` and letting ES upsert (/root/reference/elasticsearch-sink/.../
ElasticsearchSink.java:67): a replayed record overwrites itself. In a
continuous pipeline the same contract, realized *before* the sink, is
first-write-wins dedup with state that survives micro-batches — Spark's
``applyInPandasWithState`` keeps a per-key GroupState in the streaming state
store (checkpointed, recoverable), so a key admitted in batch 3 is still
known (and its replays dropped) in batch 300.

Scale notes: state is hash-partitioned by key across executors (same shuffle
as any streaming aggregation); per key we store only a boolean-sized marker
plus the admitted event-time, so state size is O(distinct keys). For
unbounded key spaces pair with a state TTL (``GroupStateTimeout``) sized to
the redelivery horizon — replays arrive within the channel's retention (the
reference's file channel kept 500 000 events, conf:26-27), not forever.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_stream_first_wins(
    events: DataFrame,
    key_col: str = "url",
    out_cols: tuple[str, ...] = ("url", "warc_ts", "lang"),
    state_timeout: str = "NoTimeout",
) -> DataFrame:
    """First occurrence of each key passes; replays/duplicates in the same
    or ANY LATER micro-batch are dropped.

    ``events`` must be a streaming DataFrame. Output columns = ``out_cols``
    (all must exist on the input). Deterministic within a batch: rows are
    considered in (key-group, input-order) order, matching the reference's
    queue order.
    """
    out_schema = ", ".join(f"{c} {_spark_type(events, c)}" for c in out_cols)
    state_schema = "seen boolean"
    cols = list(out_cols)

    def admit(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            # key already admitted in an earlier batch: drop everything
            for _ in pdfs:
                pass
            return
        first = None
        for pdf in pdfs:
            if len(pdf):
                first = pdf.iloc[[0]][cols]
                break
        for _ in pdfs:  # drain remaining batches for this key
            pass
        state.update((True,))
        if first is not None:
            yield first

    timeout = getattr(GroupStateTimeout, state_timeout)
    return events.groupBy(key_col).applyInPandasWithState(
        admit, out_schema, state_schema, "append", timeout
    )


def _spark_type(df: DataFrame, col: str) -> str:
    return dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)[col]
