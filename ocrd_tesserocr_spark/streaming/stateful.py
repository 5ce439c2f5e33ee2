"""Custom stateful streaming operator: cross-batch exact dedup.

``applyInPandasWithState`` keyed by content hash keeps a first-seen flag in
the state store, so duplicates arriving in LATER micro-batches are dropped —
the streaming twin of ``dedup.q_exact_dedup`` (keeper = first arrival, which
under deterministic replay equals min ingestion order).  This is the
"custom stateful operator" surface of the engine: state lives in Spark's
checkpointed state store, so a restarted stream resumes with its dedup
memory intact (exactly-once with the file sink).

At scale the state store shards by the same hash key the groupBy shuffles
on; state per key is one boolean + the keeper url, so 10^12 documents cost
~tens of bytes/key spread over the cluster's state backends.
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
    ]
)


def _dedup_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """First arrival per content_hash is emitted; later rows (same batch or
    any later batch) only increment the drop counter."""
    content_hash = key[0]
    dropped = 0
    first_url = None
    for pdf in pdfs:
        if not state.exists and first_url is None:
            # deterministic keeper within the batch: lexicographic min url
            first_url = pdf["url"].min()
            dropped += len(pdf) - 1
        else:
            dropped += len(pdf)
    if state.exists:
        (seen, keeper) = state.get
        yield pd.DataFrame(
            {"content_hash": [], "url": [], "n_dropped": []}
        ).astype({"content_hash": str, "url": str, "n_dropped": "int64"})
    else:
        state.update((True, first_url))
        yield pd.DataFrame(
            {
                "content_hash": [content_hash],
                "url": [first_url],
                "n_dropped": [dropped],
            }
        )


# ---------------------------------------------------------------------------
# stateful sessionization: the streaming twin of relational.q_sessionize
# (gap rule shared: a >1800 s silence closes the session).  State carries the
# open session per user across micro-batches; closed sessions are emitted
# when a later batch proves the gap, or when the processing-time timeout
# fires with no new data.
# ---------------------------------------------------------------------------
SESSION_GAP_SEC = 1800
SESSION_IDLE_FLUSH_MS = 1_800_000  # idle flush mirrors the gap rule

SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start_epoch", T.LongType(), False),
        T.StructField("session_end_epoch", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)

_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_epoch", T.LongType(), False),
        T.StructField("last_epoch", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)


def _session_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    user_id = key[0]
    closed = []
    if state.hasTimedOut:
        # idle flush: the open session ends at its last event
        start, last, n = state.get
        closed.append((user_id, start, last, n))
        state.remove()
    else:
        start = last = None
        n = 0
        if state.exists:
            start, last, n = state.get
        batches = [pdf for pdf in pdfs if len(pdf)]
        if batches:
            rows = pd.concat(batches).sort_values(["epoch", "event_id"])
            for e in rows["epoch"]:
                e = int(e)
                if last is not None and e - last > SESSION_GAP_SEC:
                    closed.append((user_id, start, last, n))
                    start, n = e, 0
                if start is None:
                    start = e
                n += 1
                last = e
        if start is not None:
            state.update((start, last, n))
            state.setTimeoutDuration(SESSION_IDLE_FLUSH_MS)
    yield pd.DataFrame(
        closed,
        columns=["user_id", "session_start_epoch", "session_end_epoch", "n_events"],
    ).astype("int64", errors="ignore")


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Streaming events(user_id, event_id, ts) -> closed sessions.

    The epoch projection is JVM-side; the Arrow state function sees only
    (user_id, event_id, epoch) — same no-per-row-Python invariant."""
    keyed = events.select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("epoch")
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
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
