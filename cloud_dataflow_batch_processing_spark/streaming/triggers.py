"""Trigger emulation — the scoped answer to Beam's trigger zoo.

Reference surface (beam/transforms/trigger.py): DefaultTrigger :233,
AfterProcessingTime :272, AfterWatermark(early, late) :320, AfterCount
:430, Repeatedly :475, AfterAny/All/Each :592-608, OrFinally :676, with
ACCUMULATING/DISCARDING modes :62.

Structured Streaming has output modes, not per-window trigger programs
(SURVEY.md §7 hard-part 1 — full parity is a non-goal). What this
module provides is the *useful subset*, built from Spark primitives:

- ``AfterWatermark`` (default trigger, DISCARDING-final) ≡ append-mode
  windowed agg — no emulation needed (streaming/windows.py).
- ``AfterWatermark(early=AfterProcessingTime(...))`` in ACCUMULATING
  mode ≡ ``early_and_final``: the same aggregation run as two queries
  over the same replayable source — update mode fires an accumulated
  pane every micro-batch (the early firings; micro-batch cadence = the
  processing-time trigger), append mode fires the on-time final pane
  when the watermark passes. Rows are tagged ``firing='early'|'final'``.
- ``AfterCount(n)`` per key ≡ ``fire_after_count``: keyed state
  buffers n elements, emits one accumulated pane per n (Repeatedly-
  wrapped count trigger, ACCUMULATING).
- ``AfterAny(AfterCount(n), AfterProcessingTime(d))`` ≡
  ``fire_after_any``: keyed state + a processing-time timeout — the
  count leg fires inline as elements arrive; the time leg fires via
  ``GroupStateTimeout.ProcessingTimeTimeout`` when a partial pane has
  been pending for ``d`` (the most common remaining Beam combinator,
  trigger.py:592 — "emit every n records or every d seconds,
  whichever comes first").
- ``AfterAll(AfterCount(n), AfterProcessingTime(d))`` ≡
  ``fire_after_all`` (trigger.py:608): a pane fires only once BOTH
  legs are satisfied — n elements buffered AND d elapsed since the
  pane opened.
- ``Repeatedly(AfterEach(AfterCount(n1), AfterCount(n2), ...))`` ≡
  ``fire_after_each_counts`` (trigger.py:571): sub-triggers govern
  panes in sequence, cycling.
- ``AfterCount(n).or_finally(AfterCount(m))`` ≡ ``fire_or_finally``
  (trigger.py:676): repeated n-panes until the finally leg (lifetime
  count m) fires one closing pane, after which the trigger is
  finished and later elements never fire again.

Late firings (``late=``) are unreachable with allowed_lateness
hardcoded to 0 in the reference (beam/transforms/core.py:1571), so
they are deliberately out of scope.

Non-finite values (pinned — tests/test_streaming_adversarial.py): the
``applyInPandasWithState`` channel is pandas-backed, and pandas uses
NaN as its NA sentinel, so a NaN accumulated inside a pane emits as
NULL (measured: even a nullable Float64 output column folds NaN→NULL
in the serializer; there is no Arrow-native stateful API to carry the
validity mask the way operators/combiners.py does for UDAFs). Panes
still FIRE on their count/time conditions — triggers are count/time-
driven, not value-driven — and a NULL total is the quarantine signal
for a poisoned pane, never a plausible wrong number. Inf survives
(only NaN is pandas' sentinel).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState

from cloud_dataflow_batch_processing_spark.streaming.state import stateful_transform


def early_and_final(
    build_agg: Callable[[], DataFrame],
    sink_early,
    sink_final,
    checkpoint_early: str,
    checkpoint_final: str,
    available_now: bool = True,
):
    """Run the same windowed aggregation as an early-firing (update
    mode, accumulating panes) and a final-firing (append mode, on-time
    pane) query pair. ``build_agg`` must construct a fresh watermarked
    aggregate per call (streaming DataFrames are single-use plans).

    ``sink_early``/``sink_final`` are foreachBatch callables
    ``(DataFrame, batch_id) -> None`` receiving rows tagged with a
    ``firing`` column. Returns both started queries (caller awaits).
    """

    def tagged(df: DataFrame, tag: str) -> DataFrame:
        return df.withColumn("firing", F.lit(tag))

    def make(writer_df, mode, ckpt, sink):
        w = (
            writer_df.writeStream.foreachBatch(sink)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
        )
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()

    q_early = make(
        tagged(build_agg(), "early"),
        "update",
        checkpoint_early,
        sink_early,
    )
    q_final = make(
        tagged(build_agg(), "final"),
        "append",
        checkpoint_final,
        sink_final,
    )
    return q_early, q_final


_EVICTED = object()  # undo-log sentinel: key was absent before the batch


def discarding_early_sink(
    sink,
    key_cols: list[str],
    value_cols: list[str],
    evict_col: str | None = None,
    evict_lateness=None,
):
    """Adapter turning an ACCUMULATING early-pane sink into a
    DISCARDING one (beam/transforms/trigger.py:62 AccumulationMode.
    DISCARDING): each delivered pane carries only the DELTA since the
    key's previous pane — valid for additive aggregates (count/sum;
    not min/max/mean), which is exactly the class Beam's discarding
    mode recombines safely downstream.

    Wrap the ``sink_early`` passed to :func:`early_and_final`::

        early_and_final(build,
                        discarding_early_sink(my_sink, ["w_start"], ["n"]),
                        my_final_sink, ...)

    State is held in the adapter (per query run — matches a trigger's
    pane lineage, which is also per-run state in Beam's driver).

    Bounded state (VERDICT r4 #7): two mechanisms keep the baseline
    from growing without bound on high-cardinality key domains:

    - The replay snapshot is an UNDO LOG of only the entries the batch
      touched — O(batch churn) per batch, never an O(total keys) copy
      (update-mode early panes deliver only changed keys, so churn is
      the natural batch size).
    - Optional watermark eviction: pass ``evict_col`` (a key column
      that is the window END — epoch number or timestamp) and
      ``evict_lateness`` (same units / a timedelta). After each batch,
      keys whose ``evict_col`` value is STRICTLY older than
      max_seen - lateness are dropped (at lateness=0 the newest window
      itself stays resident — it can still receive panes; windows that
      ended before it close). State is then bounded by (active windows
      × keys per window). A key that reappears AFTER eviction (later
      than allowed lateness) baselines at 0 and re-emits its full
      value — consistent with Beam's at-least-once pane delivery, and
      the final (append-mode) pane stays authoritative. Keys whose
      ``evict_col`` is NULL cannot participate in watermark ordering
      and are evicted at the END of the batch that delivered them
      (resident within the batch, full-value re-emit if they ever
      reappear) — otherwise NULL-windowed keys would accumulate
      forever, re-opening the leak this knob exists to close.

    At-least-once discipline (ADVICE r2 #3): foreachBatch may redeliver
    a batch (task retry, or restart from checkpoint re-running the last
    uncommitted batch). A redelivered batch_id rolls the baseline back
    via the undo log (including entries evicted by the first delivery)
    before recomputing, so the deltas come out identical instead of
    being double-subtracted against an already-advanced baseline.
    Caveat: the undo log lives in driver memory — a full PROCESS
    restart that replays the last batch from the checkpoint starts with
    an empty baseline; panes delivered before the restart are then
    re-emitted as full values, matching Beam's contract.
    """
    if (evict_col is None) != (evict_lateness is None):
        raise ValueError("evict_col and evict_lateness must be passed together")
    evict_idx = key_cols.index(evict_col) if evict_col is not None else None

    prev: dict[tuple, tuple] = {}
    # Undo log for the most recent batch: touched key -> pre-batch
    # value (or _EVICTED if absent), plus the pre-batch max watermark.
    replay: dict = {"batch_id": None, "undo": None, "max_wm": None}
    state: dict = {"max_wm": None}

    def wrapped(df, batch_id):
        if replay["batch_id"] == batch_id and replay["undo"] is not None:
            for k, v in replay["undo"].items():
                if v is _EVICTED:
                    prev.pop(k, None)
                else:
                    prev[k] = v
            state["max_wm"] = replay["max_wm"]
        undo: dict[tuple, tuple] = {}
        replay["batch_id"] = batch_id
        replay["undo"] = undo
        replay["max_wm"] = state["max_wm"]
        rows = df.collect()
        if not rows:
            return sink(df, batch_id)
        out = []
        for r in rows:
            d = r.asDict()
            k = tuple(d[c] for c in key_cols)
            cur = tuple(d[c] for c in value_cols)
            last = prev.get(k, tuple(0 for _ in value_cols))
            undo.setdefault(k, prev.get(k, _EVICTED))
            prev[k] = cur
            for c, cv, lv in zip(value_cols, cur, last):
                d[c] = cv - lv
            out.append(d)
        if evict_idx is not None:
            batch_max = max(
                (k[evict_idx] for k in undo if k[evict_idx] is not None),
                default=None,
            )
            if batch_max is not None and (
                state["max_wm"] is None or batch_max > state["max_wm"]
            ):
                state["max_wm"] = batch_max
            if state["max_wm"] is not None:
                # Strictly older than the horizon: at lateness=0 the
                # newest window itself stays resident (it can still
                # receive panes), windows that ended before it close.
                horizon = state["max_wm"] - evict_lateness
                for k in [k for k in prev if k[evict_idx] is not None and k[evict_idx] < horizon]:
                    undo.setdefault(k, prev[k])
                    del prev[k]
            # NULL window-ends are outside watermark ordering: evict at
            # end of batch (see docstring) so they can't pool forever.
            for k in [k for k in prev if k[evict_idx] is None]:
                undo.setdefault(k, prev[k])
                del prev[k]
        spark = df.sparkSession
        yield_df = spark.createDataFrame(out, schema=df.schema)
        return sink(yield_df, batch_id)

    wrapped.state_size = lambda: len(prev)  # test/observability hook
    return wrapped


def fire_after_count(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n: int,
    accumulation_mode: str = "accumulating",
) -> DataFrame:
    """AfterCount(n), Repeatedly (beam/transforms/trigger.py:430,475)
    with both accumulation modes (trigger.py:62 AccumulationMode):

    - ``accumulating``: each pane carries the key's lifetime
      (count, sum) — Beam's ACCUMULATING panes;
    - ``discarding``: each pane carries only the n elements since the
      previous firing — pane state resets after every fire.

    Output: (key, pane, n_elements, total) — one row per fired pane.
    """
    if accumulation_mode not in ("accumulating", "discarding"):
        raise ValueError(f"unknown accumulation_mode {accumulation_mode!r}")
    discarding = accumulation_mode == "discarding"

    def update(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        buffered, total, panes = state.get if state.exists else (0, 0.0, 0)
        rows = {"key": [], "pane": [], "n_elements": [], "total": []}
        for pdf in pdfs:
            for v in pdf[value_col]:
                buffered += 1
                total += float(v)
                # In discarding mode `buffered` resets per pane, so both
                # modes fire on the same condition.
                if buffered % n == 0:
                    panes += 1
                    rows["key"].append(key[0])
                    rows["pane"].append(panes)
                    rows["n_elements"].append(buffered)
                    rows["total"].append(total)
                    if discarding:
                        buffered, total = 0, 0.0
        state.update((buffered, total, panes))
        if rows["key"]:
            yield pd.DataFrame(rows)

    return stateful_transform(
        df,
        [key_col],
        update,
        state_schema="buffered long, total double, panes long",
        output_schema="key long, pane long, n_elements long, total double",
        output_mode="append",
    )


def fire_after_any(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n: int,
    processing_time_ms: int,
) -> DataFrame:
    """AfterAny(AfterCount(n), AfterProcessingTime(d)), Repeatedly,
    ACCUMULATING (beam/transforms/trigger.py:592 AfterAny, :272
    AfterProcessingTime, :430 AfterCount).

    Per key, a pane fires when EITHER n new elements have arrived since
    the last firing (cause='count', emitted inline) OR a partial pane
    has been pending for ``processing_time_ms`` (cause='time', emitted
    through the state timeout — Beam's processing-time timer). Panes
    are accumulating: each carries the lifetime element count and sum.
    Output: (key, pane, cause, n_elements, total).

    Clock approximation (ADVICE r2 #4, accepted): ``pane_start`` is
    executor wall-clock at the pane's first element, while the timeout
    itself fires on Spark's batch processing-time clock — and after a
    state rebalance the ``remaining`` computation may run on a
    different executor than the one that stamped ``pane_start``. Under
    clock skew the time pane can fire early or late by that skew. This
    matches Beam's own AfterProcessingTime contract ("fire after at
    least d" — trigger.py:272, a lower bound not a deadline); PySpark's
    GroupState exposes no batch-stable clock to do better
    (getCurrentProcessingTimeMs is JVM-only).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        rows = {"key": [], "pane": [], "cause": [], "n_elements": [], "total": []}

        def fire(cause: str, panes: int, count_all: int, total: float) -> None:
            rows["key"].append(key[0])
            rows["pane"].append(panes)
            rows["cause"].append(cause)
            rows["n_elements"].append(count_all)
            rows["total"].append(total)

        import time as _time

        if state.hasTimedOut:
            pending, total, count_all, panes, _pane_start = state.get
            if pending > 0:
                panes += 1
                fire("time", panes, count_all, total)
            state.update((0, total, count_all, panes, 0))
            # No new timer until the next element starts a new pane.
        else:
            pending, total, count_all, panes, pane_start = (
                state.get if state.exists else (0, 0.0, 0, 0, 0)
            )
            for pdf in pdfs:
                for v in pdf[value_col]:
                    if pending == 0:
                        pane_start = int(_time.time() * 1000)
                    pending += 1
                    count_all += 1
                    total += float(v)
                    if pending >= n:
                        panes += 1
                        fire("count", panes, count_all, total)
                        pending = 0
                        pane_start = 0
            state.update((pending, total, count_all, panes, pane_start))
            if pending > 0:
                # Arm the time leg relative to the pane's FIRST element
                # (AfterProcessingTime semantics) — a trickle of later
                # elements must not push the deadline back.
                remaining = pane_start + processing_time_ms - int(_time.time() * 1000)
                state.setTimeoutDuration(max(1, remaining))
        if rows["key"]:
            yield pd.DataFrame(rows)

    return stateful_transform(
        df,
        [key_col],
        update,
        state_schema="pending long, total double, count_all long, panes long, pane_start long",
        output_schema="key long, pane long, cause string, n_elements long, total double",
        output_mode="append",
        timeout=GroupStateTimeout.ProcessingTimeTimeout,
    )


def fire_after_all(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n: int,
    processing_time_ms: int,
) -> DataFrame:
    """AfterAll(AfterCount(n), AfterProcessingTime(d)), Repeatedly,
    ACCUMULATING (beam/transforms/trigger.py:608): a pane fires only
    when BOTH legs are satisfied — at least n elements buffered AND d
    elapsed since the pane's first element. Whichever leg completes
    last delivers the firing: the count leg fires inline if the clock
    already expired; otherwise the armed timeout fires once the count
    is already there. Output: (key, pane, n_elements, total).

    Same executor-wall-clock approximation as :func:`fire_after_any`
    (see its docstring) — "at least d elapsed" is a lower bound, not a
    deadline, matching Beam's AfterProcessingTime contract.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        import time as _time

        rows = {"key": [], "pane": [], "n_elements": [], "total": []}

        def fire(panes: int, count_all: int, total: float) -> None:
            rows["key"].append(key[0])
            rows["pane"].append(panes)
            rows["n_elements"].append(count_all)
            rows["total"].append(total)

        now_ms = int(_time.time() * 1000)
        if state.hasTimedOut:
            pending, total, count_all, panes, pane_start = state.get
            if pending >= n:  # count leg already satisfied → fire now
                panes += 1
                fire(panes, count_all, total)
                pending, pane_start = 0, 0
            elif pending > 0:
                # Time leg satisfied first; record it by zeroing
                # pane_start — the count leg will fire inline later.
                pane_start = -1
            state.update((pending, total, count_all, panes, pane_start))
        else:
            pending, total, count_all, panes, pane_start = (
                state.get if state.exists else (0, 0.0, 0, 0, 0)
            )
            for pdf in pdfs:
                for v in pdf[value_col]:
                    if pending == 0:
                        pane_start = now_ms
                    pending += 1
                    count_all += 1
                    total += float(v)
                    time_ok = pane_start == -1 or now_ms >= pane_start + processing_time_ms
                    if pending >= n and time_ok:
                        panes += 1
                        fire(panes, count_all, total)
                        pending, pane_start = 0, 0
            state.update((pending, total, count_all, panes, pane_start))
            if pending > 0 and pane_start > 0:
                remaining = pane_start + processing_time_ms - now_ms
                state.setTimeoutDuration(max(1, remaining))
        if rows["key"]:
            yield pd.DataFrame(rows)

    return stateful_transform(
        df,
        [key_col],
        update,
        state_schema="pending long, total double, count_all long, panes long, pane_start long",
        output_schema="key long, pane long, n_elements long, total double",
        output_mode="append",
        timeout=GroupStateTimeout.ProcessingTimeTimeout,
    )


def fire_after_each_counts(
    df: DataFrame,
    key_col: str,
    value_col: str,
    counts: list[int],
) -> DataFrame:
    """Repeatedly(AfterEach(AfterCount(n1), AfterCount(n2), ...)),
    ACCUMULATING (beam/transforms/trigger.py:571): the sub-triggers
    govern successive panes in order, cycling — pane 1 after n1
    elements, pane 2 after n2 more, ... Output:
    (key, pane, sub_trigger, n_elements, total).
    """

    def update(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        pending, total, count_all, panes = (
            state.get if state.exists else (0, 0.0, 0, 0)
        )
        rows = {"key": [], "pane": [], "sub_trigger": [], "n_elements": [], "total": []}
        for pdf in pdfs:
            for v in pdf[value_col]:
                pending += 1
                count_all += 1
                total += float(v)
                sub = panes % len(counts)
                if pending >= counts[sub]:
                    panes += 1
                    rows["key"].append(key[0])
                    rows["pane"].append(panes)
                    rows["sub_trigger"].append(sub)
                    rows["n_elements"].append(count_all)
                    rows["total"].append(total)
                    pending = 0
        state.update((pending, total, count_all, panes))
        if rows["key"]:
            yield pd.DataFrame(rows)

    return stateful_transform(
        df,
        [key_col],
        update,
        state_schema="pending long, total double, count_all long, panes long",
        output_schema="key long, pane long, sub_trigger int, n_elements long, total double",
        output_mode="append",
    )


def fire_or_finally(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n: int,
    final_count: int,
) -> DataFrame:
    """AfterCount(n).or_finally(AfterCount(final_count)), ACCUMULATING
    (beam/transforms/trigger.py:676 OrFinally): the repeated trigger
    fires an accumulated pane every n elements until the finally leg's
    lifetime count is reached — that firing (cause='finally') closes
    the trigger; later elements update nothing and never fire.
    Output: (key, pane, cause, n_elements, total).
    """

    def update(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        pending, total, count_all, panes, finished = (
            state.get if state.exists else (0, 0.0, 0, 0, False)
        )
        rows = {"key": [], "pane": [], "cause": [], "n_elements": [], "total": []}

        def fire(cause: str) -> None:
            rows["key"].append(key[0])
            rows["pane"].append(panes)
            rows["cause"].append(cause)
            rows["n_elements"].append(count_all)
            rows["total"].append(total)

        for pdf in pdfs:
            for v in pdf[value_col]:
                if finished:
                    continue
                pending += 1
                count_all += 1
                total += float(v)
                if count_all >= final_count:
                    panes += 1
                    fire("finally")
                    finished = True
                    pending = 0
                elif pending >= n:
                    panes += 1
                    fire("count")
                    pending = 0
        state.update((pending, total, count_all, panes, finished))
        if rows["key"]:
            yield pd.DataFrame(rows)

    return stateful_transform(
        df,
        [key_col],
        update,
        state_schema="pending long, total double, count_all long, panes long, finished boolean",
        output_schema="key long, pane long, cause string, n_elements long, total double",
        output_mode="append",
    )
