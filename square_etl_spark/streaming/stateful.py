"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (extension surface — SURVEY.md §2.10).

The reference has no stateful operators (SURVEY.md §2.8) — this is the
engine's demonstration of the sanctioned escape hatch for semantics
Structured Streaming's built-ins can't express: arbitrary per-key
state with explicit timeout control.  (Simple session windows use the
BUILT-IN ``F.session_window`` — ``operators/windows.sessionize_native``,
whose streaming append-mode finalization is pinned ≡ batch in
test_stateful_streaming; carrying custom per-session payloads —
counts, value sums, first/last event ids — through an
Arrow-batched Python hook is what THIS operator adds, and the same
skeleton extends to CDC folding, per-entity ML feature state, etc.)

Semantics (matching the batch twin ``operators.windows.sessionize``):
a session closes when the key sees a gap > ``gap_s`` between
consecutive events.

Two close paths, both exercised:
- **in-data gap**: when newer events prove a gap, every session except
  the still-open tail is emitted immediately — deterministic within a
  batch, no clock involved;
- **event-time timeout**: the open tail is emitted when the watermark
  passes ``last_ts + gap`` — bounded state, exactly the late-data
  tolerance the reference got from its 24 h lookback re-scan.

Scale notes: state is O(active keys) × a few scalars; the shuffle key
is the session key (user), so skew mitigation is the same hot-key
story as any aggregation.  Arrow batches move whole groups, not rows.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("closed_by", T.StringType()),  # gap | timeout
    ]
)

#: open-session state: (start_us, last_us, n_events) as epoch micros.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def sessionize_stateful(
    events: DataFrame,
    gap_s: float = 1800.0,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming sessionization over an event stream.

    ``events`` may be a streaming OR batch DataFrame — Spark runs the
    same stateful logic either way (batch mode treats the whole input
    as one group pass, which is how the unit tests pin semantics).
    """
    import pandas as pd  # local import: Arrow path only

    gap_us = int(gap_s * 1_000_000)

    def fold(
        key: tuple,
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "closed_by": ["timeout"],
                }
            )
            return

        ts_us = []
        for pdf in pdfs:
            col = pd.to_datetime(pdf[ts_col])
            ts_us.extend(int(v.value) // 1_000 for v in col)
        ts_us.sort()

        sessions: list[tuple[int, int, int]] = []  # (start, last, n)
        if state.exists:
            start_us, last_us, n = state.get
            cur = [start_us, last_us, n]
        else:
            cur = None
        for t in ts_us:
            if cur is None:
                cur = [t, t, 0]
            elif t - cur[1] > gap_us:
                sessions.append(tuple(cur))
                cur = [t, t, 0]
            cur[1] = max(cur[1], t)
            cur[2] += 1
        # keep the open tail in state; close it via event-time timeout
        state.update((cur[0], cur[1], cur[2]))
        state.setTimeoutTimestamp((cur[1] + gap_us) // 1_000)
        if sessions:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(sessions),
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _ in sessions
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="us") for _, e, _ in sessions
                    ],
                    "n_events": [n for _, _, n in sessions],
                    "closed_by": ["gap"] * len(sessions),
                }
            )

    stream = events
    if events.isStreaming:
        stream = events.withWatermark(ts_col, watermark)
    return (
        stream.select(F.col(key_col).alias("user_id"), F.col(ts_col))
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


FUNNEL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("stage", T.IntegerType()),  # 1-based
        T.StructField("stage_ts", T.TimestampType()),
    ]
)


def funnel_stateful(
    events: DataFrame,
    stages: list[str],
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming ordered funnel — the stateful twin of
    ``operators.behavior.funnel_stage_times``.  Per-key state is ONE
    timestamp per stage (O(stages) — bounded forever); each
    micro-batch sorts its events by time and advances the state
    machine: stage i is reached by the first processed event of
    stage-i type strictly after the stage-(i−1) time.  Every newly
    reached stage emits a ``(user, stage, stage_ts)`` row — a
    conversion-event stream downstream counts directly, no
    re-aggregation of history.

    Semantics contract: stage times are SET ONCE, in processing
    order.  With in-order delivery across micro-batches (availableNow
    over time-partitioned files, or any source whose cross-batch
    disorder the watermark bounds within a batch) this equals the
    batch funnel exactly — pinned in tests.  A stage-1 event arriving
    AFTER a later batch already set stage 1 from a later event does
    not retroactively improve the funnel (that would need unbounded
    candidate retention; the batch twin is the reconciliation path,
    same lookback posture as the reference's T2 re-scan).
    """
    import pandas as pd  # local import: Arrow path only

    n_stages = len(stages)
    stage_of = {s: i for i, s in enumerate(stages)}

    def fold(
        key: tuple,
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        reached = list(state.get) if state.exists else [-1] * n_stages
        rows = []
        for pdf in pdfs:
            ts = pd.to_datetime(pdf[ts_col])
            for t, typ in zip(ts, pdf[type_col]):
                rows.append((int(t.value) // 1_000, typ))
        rows.sort()
        emitted: list[tuple[int, int]] = []
        for t_us, typ in rows:
            i = stage_of.get(typ)
            if i is None or reached[i] != -1:
                continue
            if i > 0 and (reached[i - 1] == -1 or t_us <= reached[i - 1]):
                continue
            reached[i] = t_us
            emitted.append((i + 1, t_us))
        state.update(tuple(reached))
        if emitted:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(emitted),
                    "stage": [s for s, _ in emitted],
                    "stage_ts": [
                        pd.Timestamp(t, unit="us") for _, t in emitted
                    ],
                }
            )

    stream = events
    if events.isStreaming:
        stream = events.withWatermark(ts_col, watermark)
    state_schema = T.StructType(
        [
            T.StructField(f"s{i}_us", T.LongType())
            for i in range(n_stages)
        ]
    )
    return (
        stream.select(
            F.col(key_col).alias("user_id"), F.col(ts_col), F.col(type_col)
        )
        # SQL NULL semantics like the batch twin: a NULL timestamp can
        # never be a MIN-qualifying event and a NULL type matches no
        # stage — dropped HERE so they cannot reach the pandas fold,
        # where NaT would coerce to a garbage epoch and None types
        # break the (ts, type) sort
        .filter(F.col(ts_col).isNotNull() & F.col(type_col).isNotNull())
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=FUNNEL_SCHEMA,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


#: TWAP accumulator emission: raw integer state, never Python floats —
#: the final divide/round happens in Spark columns so the streaming
#: path shares the batch twin's exact engine arithmetic.
TWAP_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("num_cents", T.LongType()),
        T.StructField("total_seconds", T.LongType()),
        T.StructField("n_intervals", T.LongType()),
    ]
)

#: per-key TWAP state: last observation + exact integer accumulators.
TWAP_STATE = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("last_eid", T.LongType()),
        T.StructField("last_cents", T.LongType()),
        T.StructField("num_cents", T.LongType()),
        T.StructField("den_s", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def twap_stateful(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming time-weighted average — the stateful twin of
    ``operators.windows.time_weighted_avg``.  Per-key state is the
    last observation plus three exact integer accumulators
    (Σ value_cents·Δt, Σ Δt seconds, interval count) — O(1) per key
    forever.  Each micro-batch sorts its events by (ts, id), extends
    the interval fold from the carried last observation, and emits the
    key's CURRENT accumulators (update-style: downstream keeps the
    latest row per key).

    Exactness contract: values quantize to cents with the same
    HALF_UP-on-shortest-decimal rule as Spark's ``round(v, 2)`` (via
    ``decimal.Decimal(str(v))``), interval seconds are floored epoch
    seconds exactly like ``unix_timestamp``, and the final
    divide-and-round happens in SPARK COLUMNS over the emitted
    integers — so with in-order delivery the streaming result is
    bit-identical to the batch operator (pinned in tests), not merely
    close.  Same in-order/late-data posture as funnel_stateful: a
    late event cannot retroactively re-pair past intervals; the batch
    twin is the reconciliation path.
    """
    import pandas as pd  # local import: Arrow path only
    from decimal import ROUND_HALF_UP, Decimal

    def cents(v: float) -> int:
        return int(
            Decimal(str(v)).quantize(Decimal("0.01"), ROUND_HALF_UP) * 100
        )

    def fold(
        key: tuple,
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        if state.exists:
            last_us, last_eid, last_cents, num, den, n = state.get
        else:
            last_us, last_eid, last_cents, num, den, n = (
                None, None, None, 0, 0, 0,
            )
        rows = []
        for pdf in pdfs:
            ts = pd.to_datetime(pdf[ts_col])
            for t, eid, v in zip(ts, pdf[id_col], pdf[value_col]):
                rows.append((int(t.value) // 1_000, int(eid), float(v)))
        rows.sort(key=lambda r: (r[0], r[1]))
        for t_us, eid, v in rows:
            if last_us is not None:
                if t_us < last_us:
                    # Out-of-order across micro-batches: the watermark
                    # admits late events, but folding one here would add
                    # a NEGATIVE dt into num/den and silently corrupt
                    # the accumulators.  Mirror funnel_stateful's
                    # monotonic guard: a late event cannot retroactively
                    # re-pair past intervals — skip it; the batch twin
                    # is the reconciliation path.
                    continue
                dt = t_us // 1_000_000 - last_us // 1_000_000
                num += last_cents * dt
                den += dt
                n += 1
            last_us, last_eid, last_cents = t_us, eid, cents(v)
        state.update((last_us, last_eid, last_cents, num, den, n))
        if n > 0 and rows:
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "num_cents": [num],
                    "total_seconds": [den],
                    "n_intervals": [n],
                }
            )

    stream = events
    if events.isStreaming:
        stream = events.withWatermark(ts_col, watermark)
    return (
        stream.select(
            F.col(key_col).alias("user_id"),
            F.col(ts_col),
            F.col(id_col),
            F.col(value_col),
        )
        .filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=TWAP_SCHEMA,
            stateStructType=TWAP_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def twap_finalize(acc: DataFrame) -> DataFrame:
    """Turn emitted TWAP accumulator rows into the batch twin's output
    shape — the divide/round runs in Spark columns, so streaming and
    batch share one arithmetic path."""
    den = F.col("total_seconds")
    return acc.select(
        "user_id",
        F.round(
            F.col("num_cents") / 100.0 / F.when(den > 0, den), 6
        ).alias("twap"),
        "total_seconds",
        "n_intervals",
    )
