"""Custom stateful streaming operator (SURVEY.md §2.9 [EXT]):
running OHLC per key via ``applyInPandasWithState``.

Unlike the windowed rollup (windows.py), state here is a *running*
aggregate carried across micro-batches — the shape used for live
tickers: every batch emits the updated cumulative OHLC row per key.
State per key is O(1) (5 doubles + a count), so a million currency
pairs cost megabytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "key string, open double, high double, low double, close double, "
    "volume double, n bigint"
)
STATE_SCHEMA = (
    "first_ts long, last_ts long, open double, high double, low double, "
    "close double, volume double, n bigint"
)


def _update_ohlc(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        first_ts, last_ts, o, h, lo, c, vol, n = state.get
    else:
        first_ts, last_ts, o, h, lo, c, vol, n = (None, None, None, None, None, None, 0.0, 0)
    for pdf in pdfs:
        if pdf.empty:
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        ts_us = (pdf["ts"].astype("int64")) // 1000 * 1000  # ns→us, keep long
        if first_ts is None or int(ts_us.iloc[0]) < first_ts:
            first_ts = int(ts_us.iloc[0])
            o = float(pdf["value"].iloc[0])
        if last_ts is None or int(ts_us.iloc[-1]) >= last_ts:
            last_ts = int(ts_us.iloc[-1])
            c = float(pdf["value"].iloc[-1])
        batch_hi = float(pdf["value"].max())
        batch_lo = float(pdf["value"].min())
        h = batch_hi if h is None else max(h, batch_hi)
        lo = batch_lo if lo is None else min(lo, batch_lo)
        vol += float(pdf["value"].sum())
        n += len(pdf)
    state.update((first_ts, last_ts, o, h, lo, c, vol, n))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "open": [o],
            "high": [h],
            "low": [lo],
            "close": [c],
            "volume": [vol],
            "n": [n],
        }
    )


def running_ohlc(events: DataFrame, key_col: str = "event_type") -> DataFrame:
    """events(ts, event_id, value, key_col) stream → one updated
    cumulative OHLC row per key per micro-batch (update output mode)."""
    return (
        events.selectExpr(f"{key_col} as key", "ts", "event_id", "value")
        .groupBy("key")
        .applyInPandasWithState(
            _update_ohlc,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ------------------------- transformWithStateInPandas (Spark 4 API) ------

try:  # Spark 4.0+ only; applyInPandasWithState above is the fallback
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningOHLCProcessor(StatefulProcessor):
        """Same running-OHLC semantics on the arbitrary-state v2 API.

        ValueState keeps the identical O(1)-per-key tuple; the v2 runtime
        adds state TTL, timers, and RocksDB-backed state out of the box —
        the 100 TB path where per-key state must spill off-heap.
        """

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("ohlc", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                first_ts, last_ts, o, h, lo, c, vol, n = self._state.get()
            else:
                first_ts = last_ts = o = h = lo = c = None
                vol, n = 0.0, 0
            for pdf in rows:
                if pdf.empty:
                    continue
                pdf = pdf.sort_values(["ts", "event_id"])
                ts_us = (pdf["ts"].astype("int64")) // 1000 * 1000
                if first_ts is None or int(ts_us.iloc[0]) < first_ts:
                    first_ts = int(ts_us.iloc[0])
                    o = float(pdf["value"].iloc[0])
                if last_ts is None or int(ts_us.iloc[-1]) >= last_ts:
                    last_ts = int(ts_us.iloc[-1])
                    c = float(pdf["value"].iloc[-1])
                batch_hi = float(pdf["value"].max())
                batch_lo = float(pdf["value"].min())
                h = batch_hi if h is None else max(h, batch_hi)
                lo = batch_lo if lo is None else min(lo, batch_lo)
                vol += float(pdf["value"].sum())
                n += len(pdf)
            self._state.update((first_ts, last_ts, o, h, lo, c, vol, n))
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "open": [o],
                    "high": [h],
                    "low": [lo],
                    "close": [c],
                    "volume": [vol],
                    "n": [n],
                }
            )

        def close(self) -> None:
            pass

    def running_ohlc_tws(events: DataFrame, key_col: str = "event_type") -> DataFrame:
        """``running_ohlc`` on ``transformWithStateInPandas`` — identical
        output contract, newer state runtime (requires the RocksDB state
        store provider, configured by the caller's session, and the
        ``protobuf`` package for the Python↔JVM state protocol — absent
        in some environments, in which case ``running_ohlc`` is the
        drop-in fallback)."""
        return (
            events.selectExpr(f"{key_col} as key", "ts", "event_id", "value")
            .groupBy("key")
            .transformWithStateInPandas(
                RunningOHLCProcessor(),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
        )

except ImportError:  # pragma: no cover - older Spark
    running_ohlc_tws = None
