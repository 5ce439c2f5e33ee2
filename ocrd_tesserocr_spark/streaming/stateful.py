"""Custom stateful streaming operators: cross-batch exact dedup and
event-time sessionization.

``applyInPandasWithState`` keyed by content hash keeps a first-seen flag in
the state store, so duplicates arriving in LATER micro-batches are dropped —
the streaming twin of ``dedup.q_exact_dedup`` (keeper = lexicographic min
url within the first-seen batch; deterministic under replay because the min
is taken over ALL Arrow chunks of the group, not just the first).  State
lives in Spark's checkpointed state store, so a restarted stream resumes
with its dedup memory intact (exactly-once with the file sink).

At scale the state store shards by the same hash key the groupBy shuffles
on; state per key is one boolean + the keeper url + a cumulative drop
counter, so 10^12 documents cost ~tens of bytes/key spread over the
cluster's state backends.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("n_dropped", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("seen", T.BooleanType(), False),
        T.StructField("keeper_url", T.StringType(), False),
        T.StructField("n_dropped", T.LongType(), False),
    ]
)


def _dedup_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """First arrival per content_hash is emitted; later rows (same batch or
    any later batch) only increment the cumulative drop counter in state.

    The keeper decision is made only AFTER draining every Arrow chunk of
    the group: Arrow may split one group across chunks, and a chunk-local
    min would make the keeper depend on chunk boundaries (nondeterministic
    replay).  The emitted ``n_dropped`` covers the first-seen batch; the
    running total across all batches lives in state (append output mode
    cannot revise an already-emitted row).
    """
    content_hash = key[0]
    total = 0
    min_url = None
    for pdf in pdfs:
        if not len(pdf):
            continue
        total += len(pdf)
        chunk_min = pdf["url"].min()
        if min_url is None or chunk_min < min_url:
            min_url = chunk_min
    if state.exists:
        seen, keeper, n_dropped = state.get
        state.update((True, keeper, n_dropped + total))
        yield pd.DataFrame(
            {"content_hash": [], "url": [], "n_dropped": []}
        ).astype({"content_hash": str, "url": str, "n_dropped": "int64"})
    else:
        dropped = total - 1
        state.update((True, min_url, dropped))
        yield pd.DataFrame(
            {
                "content_hash": [content_hash],
                "url": [min_url],
                "n_dropped": [dropped],
            }
        )


# ---------------------------------------------------------------------------
# stateful sessionization: the streaming twin of relational.q_sessionize
# (gap rule shared: a >1800 s silence closes the session).  State carries the
# open session per user across micro-batches.
#
# EVENT-time semantics (the only variant — the processing-time one was
# retired: a late event rewound its `last` and closed live sessions): the
# stream carries a watermark, the
# open-session state merges late (out-of-order) events by interval overlap,
# and the idle flush is an EventTimeTimeout at last_event + gap — so a late
# event that belongs INSIDE the open session widens it instead of corrupting
# the gap arithmetic, and sessions close exactly when the watermark proves
# no in-window event can still arrive.
# ---------------------------------------------------------------------------
SESSION_GAP_SEC = 1800
SESSION_WATERMARK = "30 minutes"  # late-data bound = the gap rule

SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start_epoch", T.LongType(), False),
        T.StructField("session_end_epoch", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)

#: the open-session state holds a LIST of gap-separated intervals (as
#: parallel arrays): a session may only close once the watermark proves
#: no in-window event can still bridge or extend it, and until then a
#: LATER session for the same user can already be open — one slot is not
#: enough (closing early splits true sessions on late data).
_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("starts", T.ArrayType(T.LongType()), False),
        T.StructField("lasts", T.ArrayType(T.LongType()), False),
        T.StructField("ns", T.ArrayType(T.LongType()), False),
    ]
)


def _session_fn_event(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Event-time sessionization with out-of-order merge.

    Incoming epochs (plus the open intervals from state, pre-counted) are
    merged with the standard interval-union rule under the gap: a late
    event within [start-gap, last+gap] of an interval joins it; bridged
    intervals coalesce.  An interval is emitted as a closed session ONLY
    when the watermark passes its end + gap — before that, an in-window
    late event could still extend or bridge it, so it stays in state.
    The event-time timeout is armed at the earliest unproven end + gap,
    so sessions flush as soon as the watermark proves them, even with no
    further data for the key.
    """
    user_id = key[0]
    intervals: list[list[int]] = []
    if state.exists:
        starts, lasts, ns = state.get
        intervals = [[int(s), int(l), int(n)] for s, l, n in zip(starts, lasts, ns)]
    epochs: list[int] = []
    if not state.hasTimedOut:
        for pdf in pdfs:
            if len(pdf):
                epochs.extend(int(e) for e in pdf["epoch"])
    for e in sorted(epochs):
        for iv in intervals:
            if iv[0] - SESSION_GAP_SEC <= e <= iv[1] + SESSION_GAP_SEC:
                if e < iv[0]:
                    iv[0] = e
                if e > iv[1]:
                    iv[1] = e
                iv[2] += 1
                break
        else:
            intervals.append([e, e, 1])
    intervals.sort()
    merged: list[list[int]] = []
    for iv in intervals:
        if merged and iv[0] - merged[-1][1] <= SESSION_GAP_SEC:
            if iv[1] > merged[-1][1]:
                merged[-1][1] = iv[1]
            merged[-1][2] += iv[2]
        else:
            merged.append(iv)
    wm_ms = state.getCurrentWatermarkMs()
    # STRICT close: Spark keeps rows whose event time EQUALS the watermark,
    # so an event at exactly last+gap can still arrive (and would join:
    # e <= last+gap above) while wm == last+gap — only wm strictly past
    # the boundary proves the session
    closed = [
        (user_id, s, l, n)
        for s, l, n in merged
        if (l + SESSION_GAP_SEC) * 1000 < wm_ms
    ]
    still_open = [iv for iv in merged if (iv[1] + SESSION_GAP_SEC) * 1000 >= wm_ms]
    if still_open:
        state.update((
            [iv[0] for iv in still_open],
            [iv[1] for iv in still_open],
            [iv[2] for iv in still_open],
        ))
        # earliest unproven end + gap is >= wm by construction of
        # still_open; the timeout timestamp must be > wm, so nudge the
        # boundary case by 1 ms (fires at the next watermark advance,
        # exactly when the strict close above becomes provable)
        state.setTimeoutTimestamp(
            max(
                min((iv[1] + SESSION_GAP_SEC) for iv in still_open) * 1000,
                wm_ms + 1,
            )
        )
    elif state.exists:
        state.remove()
    yield pd.DataFrame(
        closed,
        columns=["user_id", "session_start_epoch", "session_end_epoch", "n_events"],
    ).astype("int64")


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Streaming events(user_id, event_id, ts) -> closed sessions
    (event-time: watermarked, late-data-safe).

    The epoch projection is JVM-side; the Arrow state function sees only
    (user_id, event_id, epoch) — same no-per-row-Python invariant."""
    # `ts` must survive the projection: it carries the watermark tag the
    # event-time timeout is validated against
    keyed = events.withWatermark("ts", SESSION_WATERMARK).select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("epoch"), "ts"
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _session_fn_event,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def dedup_stream(pages: DataFrame) -> DataFrame:
    """Streaming pages -> first-seen rows per content hash.

    The hash is computed JVM-side (md5 over the binary payload) so the only
    Python is the Arrow-batched state function — same no-per-row-Python
    invariant as the batch kernel.
    """
    keyed = pages.select(F.md5(F.col("html")).alias("content_hash"), "url")
    return keyed.groupBy("content_hash").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
