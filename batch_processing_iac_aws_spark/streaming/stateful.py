"""Custom stateful streaming operators via applyInPandasWithState.

Where dropDuplicatesWithinWatermark / session_window cover the built-in
stateful shapes, applyInPandasWithState is the escape hatch for operator
semantics Spark doesn't ship: arbitrary per-key state (here, running
totals) updated per micro-batch with Arrow-batched pandas UDFs.

Scale posture: state lives in the state store partitioned by the grouping
key (one shuffle, same key a downstream keyed agg would reuse); memory is
bounded per key, and for time-bounded semantics pass a GroupStateTimeout
instead of NoTimeout so idle keys are garbage-collected.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Output row per key per micro-batch: the running totals after the batch.
_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
#: State accumulates the value sum in INTEGER MICROS (round(value*1e6)):
#: int64 addition is exact and order-free, so the emitted total cannot
#: depend on micro-batch arrival order — a plain double accumulator could
#: land a sum on either side of a rounding boundary depending on
#: scheduling, turning the differential oracle flaky.
_STATE_SCHEMA = "n bigint, s bigint"


def running_user_totals(
    events: DataFrame, *, timeout: str = GroupStateTimeout.NoTimeout
) -> DataFrame:
    """Running per-user (count, sum(value)) maintained in group state.

    Each micro-batch emits one row per active user with the totals seen so
    far — the streaming analogue of a cumulative groupBy that batch mode
    can't express incrementally without reprocessing history.

    ``timeout`` defaults to NoTimeout for a BOUNDED key domain (the
    user dimension); with high/rotating key cardinality state grows one
    entry per key forever, so pass ``GroupStateTimeout.ProcessingTimeTimeout``
    (and call ``state.setTimeoutDuration`` in a custom update) or front
    the stream with a watermarked pre-aggregation — the parameter exists
    so a long-running deployment is not locked into unbounded state.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            n, s = state.get
        else:
            n, s = 0, 0
        for pdf in pdfs:
            n += len(pdf)
            v = pdf["value"].to_numpy(dtype="float64")
            # round-half-away-from-zero to integer micros, matching SQL
            # round(value*1e6) (numpy .round alone would round half-even)
            s += int(
                (np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5))
                .astype("int64")
                .sum()
            )
        state.update((n, s))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [s / 1e6],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
