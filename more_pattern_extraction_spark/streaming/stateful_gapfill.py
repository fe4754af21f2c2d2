"""Stateful streaming gap-fill: LOCF whose carry value survives across
micro-batches via ``applyInPandasWithState`` (SURVEY §2.9 — the custom
stateful operator the batch gap-fill leg needs to run on a live feed;
reference semantics: the LOCF leg of chunk_interpolate,
``modules/preprocessing.py:185-208``).

State per conversation is ONE double (the last observed value) — bounded
regardless of stream length, the shape that survives 10^12 turns.  A
group's rows within a micro-batch are concatenated across Arrow chunks
and sorted by event time ONCE before filling (chunk arrival order is
shuffle order, not event-time order); cross-batch correctness assumes
per-conversation monotone arrival (late rows are the batch tier's
nightly-repair job, same contract as rollup_stream.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "conv_id string, ts timestamp, value double, value_locf double"
STATE_SCHEMA = "last double"


def _locf_fn(key: tuple, pdfs, state: GroupState):
    # applyInPandasWithState splits a group's rows within a micro-batch
    # into multiple Arrow chunks in SHUFFLE-ARRIVAL order, not event-time
    # order — filling chunk-by-chunk could carry a later value backwards.
    # Materialize the whole group's batch and sort ONCE: state is one
    # double, and a group's per-batch rows must fit in memory under this
    # operator anyway.
    last = state.get[0] if state.exists else None
    pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
    s = pdf["value"].astype("float64")
    filled = s.ffill()
    if last is not None:
        filled = filled.fillna(last)
    obs = s.dropna()
    if len(obs):
        last = float(obs.iloc[-1])
    yield pd.DataFrame(
        {
            "conv_id": key[0],
            "ts": pdf["ts"],
            "value": s,
            "value_locf": filled,
        }
    )
    if last is not None:
        state.update((last,))


def streaming_locf(stream: DataFrame) -> DataFrame:
    """(conv_id, ts, value) stream → rows with ``value_locf`` filled,
    the carry surviving micro-batch boundaries."""
    return (
        stream.select("conv_id", "ts", "value")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _locf_fn,
            OUT_SCHEMA,
            STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
