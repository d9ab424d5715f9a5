"""Alarm scheduling — csp.schedule_alarm / cancel_alarm re-expressed
for the batch tick model.

Reference: csp/impl/builtin_functions.py:286-304 (node-local one-shot
alarms: ``schedule_alarm(alarm, delay, value)`` makes the alarm input
tick ``value`` after ``delay``; ``cancel_alarm`` revokes a scheduled
handle before it fires) and cpp/csp/engine/Scheduler.h (the event
queue, which Spark's plan replaces).

Batch re-expression: an alarm is data, not control flow — a REQUEST
stream (each tick schedules one alarm carrying its value) plus an
optional CANCEL stream (each tick names the request seq it revokes)
produce the stream of alarms that actually fire, at request-time +
delay. This is exactly what a ported @csp.node's alarm logic computes
over a full run, and it stays a join + filter: no driver-side state,
partitioned by key like every other operator.

For realtime ports, the same request/cancel streams feed
applyInPandasWithState with a timeout per group — see
streaming/ops.py for the stateful pattern.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import functions as F

from ..core.ticks import KEY, SEQ, TS, TickStream

__all__ = ["schedule_alarm", "alarm_stream", "cancel_alarm"]


def schedule_alarm(
    requests: TickStream, delay: _dt.timedelta
) -> TickStream:
    """Every request tick fires an alarm ``delay`` later carrying the
    request's value — csp.schedule_alarm with no cancellation
    (builtin_functions.py:286-295). Pure column arithmetic on ts."""
    us = round(delay.total_seconds() * 1_000_000)
    out = requests.df.withColumn(
        TS, F.timestamp_micros(F.unix_micros(F.col(TS)) + F.lit(us))
    )
    return requests.with_df(out)


def alarm_stream(
    requests: TickStream,
    delay: _dt.timedelta,
    cancels: TickStream | None = None,
) -> TickStream:
    """Alarms that actually FIRE: request at t fires at t+delay unless
    a cancel naming its seq arrives in [t, t+delay) on the same key —
    csp.cancel_alarm semantics (builtin_functions.py:297-304; a cancel
    after the alarm fired is a no-op, as in the reference).

    ``cancels``' value column holds the request seq (long) to revoke.
    Plan shape: one left anti-join on (key, seq) with the time-window
    predicate — at scale both sides shuffle on key once; no state."""
    fired = schedule_alarm(requests, delay)
    if cancels is None:
        return fired
    return cancel_alarm(fired, delay, cancels)


def cancel_alarm(
    fired: TickStream, delay: _dt.timedelta, cancels: TickStream
) -> TickStream:
    """csp.cancel_alarm (builtin_functions.py:297-304) as a stream op:
    revoke scheduled alarms whose request seq a cancel tick names
    before the fire time. Exposed under the reference name; the
    combined request→fire→cancel pipeline is ``alarm_stream``."""
    us = round(delay.total_seconds() * 1_000_000)
    c = cancels.df.select(
        F.col(KEY).alias("__ck"),
        F.col(cancels.value_col).cast("long").alias("__cseq"),
        F.unix_micros(F.col(TS)).alias("__cus"),
    )
    f = fired.df
    fire_us = F.unix_micros(F.col(TS))
    out = f.join(
        c,
        on=[
            F.col(KEY) == F.col("__ck"),
            F.col(SEQ) == F.col("__cseq"),
            # cancel effective if it lands before the fire time but not
            # before the request itself was scheduled
            F.col("__cus") < fire_us,
            F.col("__cus") >= fire_us - F.lit(us),
        ],
        how="left_anti",
    )
    return fired.with_df(out)
