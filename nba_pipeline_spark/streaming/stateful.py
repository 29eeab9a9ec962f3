"""Arbitrary stateful streaming (SURVEY §2.11 T7): the reference's
period-counter scan (playByplay.py:19-41 / operators.windows.
running_count_with_reset) as an ``applyInPandasWithState`` operator.

State per key = (rows_seen, counter). Each micro-batch's rows are
sorted by ``seq`` inside the group, the counter continues from state,
so the result over N micro-batches equals the batch window op —
asserted by tests/test_streaming_stateful.py.

Scale notes: state is one small tuple per key in the state store;
per-batch work is a grouped Arrow transfer — the same shuffle key as
the batch window version. This is the template for any carry-forward
scan (score fill, session carry) that must run continuously.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("game_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("period", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("rows_seen", T.LongType()),
        T.StructField("counter", T.LongType()),
    ]
)


def _apply(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows_seen, counter = state.get if state.exists else (0, 1)
    for pdf in pdfs:
        pdf = pdf.sort_values("seq")
        periods = []
        for is_reset in pdf["is_reset"]:
            if rows_seen > 0 and is_reset:
                counter += 1
            rows_seen += 1
            periods.append(counter)
        out = pd.DataFrame(
            {"game_id": pdf["game_id"].values, "seq": pdf["seq"].values, "period": periods}
        )
        yield out
    state.update((rows_seen, counter))


FFILL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("game_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("filled", T.DoubleType()),
    ]
)

FFILL_STATE_SCHEMA = T.StructType([T.StructField("last_value", T.DoubleType())])


def _ffill_apply(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (last,) = state.get if state.exists else (None,)
    for pdf in pdfs:
        pdf = pdf.sort_values("seq")
        filled = []
        for v in pdf["v"]:
            if v is not None and not pd.isna(v):
                last = float(v)
            filled.append(last)
        yield pd.DataFrame(
            {"game_id": pdf["game_id"].values, "seq": pdf["seq"].values, "filled": filled}
        )
    state.update((last,))


def streaming_forward_fill(events: DataFrame) -> DataFrame:
    """T7: the score forward-fill (W2, playByplay.py:43-65) as a
    continuous stream — last non-null value per key carries across
    micro-batches. Input: (game_id, seq, v); output (game_id, seq,
    filled) with NULL before the first value (apply a COALESCE default
    downstream, matching the batch operator's ``default``)."""
    from ..session import tune

    tune(events.sparkSession)
    return events.groupBy("game_id").applyInPandasWithState(
        _ffill_apply,
        outputStructType=FFILL_OUTPUT_SCHEMA,
        stateStructType=FFILL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_period_counter(events: DataFrame) -> DataFrame:
    """Input: streaming frame with (game_id, seq, is_reset boolean).
    Output: (game_id, seq, period) — continuous W1 semantics."""
    from ..session import tune

    tune(events.sparkSession)
    return events.groupBy("game_id").applyInPandasWithState(
        _apply,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def tws_available() -> bool:
    """transformWithState's Python runner speaks protobuf to the JVM;
    without the `google.protobuf` package the driver worker crashes at
    init. Probe so callers/tests can fall back to
    ``applyInPandasWithState`` in slim environments."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def streaming_period_counter_tws(events: DataFrame) -> DataFrame:
    """Same W1 semantics on Spark 4's ``transformWithStateInPandas``
    (the successor API: typed per-key state via a StatefulProcessor,
    RocksDB state store required). Kept alongside the
    ``applyInPandasWithState`` version so both stateful surfaces stay
    exercised; results must be identical (asserted by
    tests/test_udfs_stateful.py, which skips where `tws_available()`
    is False — the runner needs `google.protobuf` at runtime).

    Scale notes: state here is a ValueState holding one (rows_seen,
    counter) pair per key — RocksDB keeps it off-heap and incrementally
    checkpointed, which is the 100 TB-state story applyInPandasWithState
    (HDFS-backed full snapshots) lacks.
    """
    from pyspark.sql.streaming import StatefulProcessor
    from pyspark.sql.streaming.stateful_processor import StatefulProcessorHandle

    from ..session import tune

    tune(events.sparkSession)
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    class PeriodCounterProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("counter", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            rows_seen, counter = (
                self._state.get() if self._state.exists() else (0, 1)
            )
            for pdf in rows:
                pdf = pdf.sort_values("seq")
                periods = []
                for is_reset in pdf["is_reset"]:
                    if rows_seen > 0 and is_reset:
                        counter += 1
                    rows_seen += 1
                    periods.append(counter)
                yield pd.DataFrame(
                    {
                        "game_id": pdf["game_id"].values,
                        "seq": pdf["seq"].values,
                        "period": periods,
                    }
                )
            self._state.update((rows_seen, counter))

        def close(self) -> None:
            pass

    return events.groupBy("game_id").transformWithStateInPandas(
        PeriodCounterProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

EWMA_STATE_SCHEMA = T.StructType(
    [T.StructField("acc", T.DoubleType()), T.StructField("seeded", T.BooleanType())]
)


def _ewma_apply(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    acc, seeded = state.get if state.exists else (0.0, False)
    alpha = 0.1
    # The fold is order-sensitive across the WHOLE group: Arrow hands the
    # micro-batch to us in >=1 chunks, and sorting each chunk separately
    # would fold chunk 2's early seqs after chunk 1's late ones whenever a
    # key's batch spans chunks (>~10k rows/key/trigger). Concatenate first,
    # sort once — the per-trigger data for one key is bounded by the
    # trigger interval, not the stream, so this stays in memory.
    chunks = [c for c in pdfs if len(c)]
    if not chunks:  # NoTimeout => shouldn't happen, but don't crash concat
        state.update((acc, seeded))
        return
    pdf = pd.concat(chunks, ignore_index=True).sort_values("seq")
    out = []
    for v in pdf["value"]:
        x = float(v) if v is not None and not pd.isna(v) else None
        if x is None:
            acc = None  # NULL poisons the fold, exactly like the batch lambda
            seeded = True
        elif not seeded:
            acc, seeded = x, True  # first value seeds the accumulator
        elif acc is not None:
            acc = alpha * x + (1 - alpha) * acc
        # else: already poisoned — stays None forever (batch parity)
        out.append(acc)
    yield pd.DataFrame(
        {"user_id": pdf["user_id"].values, "seq": pdf["seq"].values, "ewma": out}
    )
    state.update((acc, seeded))


def streaming_ewma(events: DataFrame) -> DataFrame:
    """The incremental twin of the batch ordered fold (q_ewma): state
    per key is just (accumulator, seeded) — no history materializes,
    so unbounded keys and unbounded streams both hold. Input:
    (user_id, seq, value); output the running EWMA after each event.
    The Nth output for a key equals the batch fold over its first N
    events — the equivalence the test asserts."""
    from ..session import tune

    tune(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        _ewma_apply,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
