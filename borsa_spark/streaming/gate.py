"""Streaming monotonic gate (T8) — keyed state over a live stream.

Semantics (borsa/src/router/streaming/filters.rs:12-74): per symbol, drop an
update strictly older than the high-water-mark timestamp; equal allowed;
first always passes; entries expire after 24h idle (reaper :16-36); state is
dropped when a session ends (:65-73) so a restarted provider starts fresh.

Spark mapping: ``applyInPandasWithState`` keyed by symbol holding one i64
(the HWM, microseconds). This is NOT ``dropDuplicatesWithinWatermark``
(which dedups exact keys) nor a watermark filter (which drops by global
delay): the rule is *per-key monotonicity with equals allowed*, and the
reference applies it in arrival order — so the gate processes each
micro-batch in ``seq`` order within a key. TTL via ProcessingTimeTimeout.

At scale: state is one long per symbol — millions of symbols fit trivially;
the shuffle is keyed by symbol (matches the natural stream partitioning).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GATE_TTL_MS = 24 * 60 * 60 * 1000  # filters.rs ENTRY_TTL = 24h


def _gate_fn(out_schema_cols: list[str], ts_col: str, order_col: str | None):
    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        hwm = state.get[0] if state.exists else None
        for pdf in pdfs:
            if order_col is not None:
                pdf = pdf.sort_values(order_col, kind="stable")
            ts = pdf[ts_col].astype("int64")  # ns since epoch
            keep = []
            for t in ts:
                if hwm is None or t >= hwm:
                    keep.append(True)
                    if hwm is None or t > hwm:
                        hwm = t
                else:
                    keep.append(False)
            out = pdf[pd.Series(keep, index=pdf.index)]
            if len(out):
                yield out[out_schema_cols]
        if hwm is not None:
            state.update((int(hwm),))
            state.setTimeoutDuration(GATE_TTL_MS)

    return fn


def streaming_monotonic_gate(
    updates: DataFrame,
    key: str = "symbol",
    ts_col: str = "ts",
    order_col: str | None = "seq",
) -> DataFrame:
    """Apply the drop-older-keep-equal gate to a streaming DataFrame.

    ``order_col`` fixes intra-batch arrival order (the fan-in sequence
    number); pass None to trust batch row order.
    """
    cols = updates.columns
    schema = updates.schema
    return updates.groupBy(key).applyInPandasWithState(
        _gate_fn(cols, ts_col, order_col),
        outputStructType=schema,
        stateStructType="hwm long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
