"""Custom stateful streaming operators (applyInPandasWithState).

The built-in windows (streaming/windows.py) cover time-bucketed aggs;
this module is the escape hatch for operator state that isn't a window
— here, a per-user running profile (event count, value sum, last-seen
timestamp) maintained across micro-batches with Arrow-batched pandas
kernels. State is a flat tuple per key; timeouts are left to the
caller's watermark policy (NoTimeout default keeps the example exact).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts timestamp"
# last_ts rides the state as epoch MICROseconds (a long — GroupState
# tuples don't carry pandas Timestamps): without it, a micro-batch made
# only of LATE events would emit a REGRESSED "last-seen" timestamp (that
# batch's max, not the running max) while the counters stayed correct.
#
# SCHEMA MIGRATION (ADVICE r13): this schema grew from 2 fields
# (n_events, total_value) to 3 when last_ts_us was added. The state
# STORE schema is part of the checkpoint: Spark's state-store schema
# compatibility check rejects a resume from an old-schema checkpoint at
# stream start ([STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE]) — it never
# reaches the Python kernel, so a len-2 tuple cannot appear in
# ``state.get`` at runtime. The defensive unpack below still handles it
# (last seen = unknown → None) so that IF a deployment disables the
# compatibility check (spark.sql.streaming.stateStore.stateSchemaCheck)
# the resume degrades gracefully instead of dying on a tuple-unpack
# error mid-batch. Operators changing this schema again: either keep
# the prefix stable and append (this pattern), or document that
# checkpoints must be discarded on upgrade.
STATE_SCHEMA = "n_events long, total_value double, last_ts_us long"


def _update_user_profile(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch into the running (count, sum, max-ts) state
    and emit the refreshed profile row. Pure pandas per Arrow batch — no
    per-row Python in the hot path."""
    (user_id,) = key
    if state.exists:
        prior = tuple(state.get)
        # legacy 2-field state (pre-last_ts_us checkpoints, see
        # STATE_SCHEMA note): treat last-seen as unknown, not a crash
        n_events, total_value = prior[0], prior[1]
        last_ts_us = prior[2] if len(prior) > 2 else None
    else:
        n_events, total_value, last_ts_us = 0, 0.0, None
    last_ts = pd.Timestamp(last_ts_us, unit="us") if last_ts_us is not None else None
    for pdf in batches:
        n_events += len(pdf)
        total_value += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        # a micro-batch whose ts are ALL NaT (max() skips NaT only when
        # some value survives) must not become the running last-seen:
        # NaT assigned here would store NaT.value (−2^63 µs) as
        # last_ts_us and the NEXT batch's pd.Timestamp(unit="us")
        # reconstruction raises OutOfBoundsDatetime — a poisoned state
        # row that kills the stream long after the bad batch (r16
        # sweep, the qsketch NaN-in-top-bin class). Counters still fold.
        if pd.notna(batch_max):
            last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update(
        (
            n_events,
            total_value,
            int(last_ts.value // 1000) if last_ts is not None else None,
        )
    )
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n_events],
            "total_value": [round(total_value, 2)],
            "last_ts": [last_ts],
        }
    )


def user_profile_stream(events: DataFrame) -> DataFrame:
    """Stateful per-user profile over a (streaming or batch) events
    DataFrame. On a stream this runs incrementally with state persisted
    in the state store; output mode 'update' emits refreshed profiles."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
