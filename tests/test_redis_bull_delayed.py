"""S1-delay: Bull's delayed sorted set — timed redelivery for the
reference's three failure paths (batch-failure demotion 2 s +
exponential backoff base 3 s with attempts=5, src/main.ts:486,502-507;
bulker-full 5 s, :393-415; emergency-busy random 2-11 s, :300-320),
driven with an injectable fake clock so redelivery ORDERING is
deterministic."""

from __future__ import annotations

import json

import pytest

from redis_events_to_clickhouse_tables_spark.sources.redis_bull import (
    BULKER_FULL_DELAY_MS,
    FAIL_ATTEMPTS,
    FAIL_BACKOFF_BASE_MS,
    FAIL_DELAY_MS,
    RedisBullSource,
)

from tests.test_redis_bull_source import FakeRedis


class FakeClock:
    """ms-epoch clock tests advance by hand."""

    def __init__(self, t0: int = 1_700_000_000_000):
        self.t = t0

    def __call__(self) -> int:
        return self.t

    def advance(self, ms: int) -> int:
        self.t += ms
        return self.t


def _source(spark, fake, clock, **kw):
    return RedisBullSource(
        spark, queue="q", client=fake, now_ms=clock, **kw
    )


def _polled_values(df) -> list[dict]:
    return [json.loads(r["value"]) for r in df.collect()]


@pytest.mark.parametrize("wire_format", ["payload", "bull"])
def test_delayed_job_invisible_until_due(spark, wire_format):
    fake, clock = FakeRedis(), FakeClock()
    src = _source(spark, fake, clock, wire_format=wire_format)
    src.add_job({"event_type": "e", "n": 1}, delay_ms=2000)

    assert fake.zcard("bull:q:delayed") == 1
    assert src.poll().count() == 0  # not due yet

    clock.advance(1999)
    assert src.poll().count() == 0  # 1 ms early: still parked

    clock.advance(1)
    df = src.poll()
    assert _polled_values(df) == [{"event_type": "e", "n": 1}]
    assert fake.zcard("bull:q:delayed") == 0
    assert src.ack() == 1


@pytest.mark.parametrize("wire_format", ["payload", "bull"])
def test_promotion_preserves_due_time_order_behind_live_traffic(
    spark, wire_format
):
    """Two delayed jobs promote in DUE-TIME order (not insert order)
    and land at the TAIL of wait, behind already-waiting traffic —
    classic Bull's delayed-set timer semantics."""
    fake, clock = FakeRedis(), FakeClock()
    src = _source(spark, fake, clock, wire_format=wire_format)
    src.add_job({"n": "late"}, delay_ms=5000)
    src.add_job({"n": "soon"}, delay_ms=1000)
    src.add_job({"n": "live"})  # goes straight to wait

    clock.advance(5000)
    vals = [v["n"] for v in _polled_values(src.poll())]
    assert vals == ["live", "soon", "late"]


def test_failed_event_demotion_schedule_bull(spark):
    """E1 demotion replayed end-to-end in bull wire format: 2 s
    initial delay, then Bull's builtin exponential backoff
    round((2^attemptsMade - 1) * 3000) per retry, moved to the failed
    key when attemptsMade reaches attempts=5 (src/main.ts:486,502-507
    + bull lib/backoffs.js)."""
    fake, clock = FakeRedis(), FakeClock()
    src = _source(spark, fake, clock, wire_format="bull")
    token = src.requeue_failed_event({"event_type": "e", "v": 7})
    assert fake.zcard("bull:q:delayed") == 1

    # initial delivery after the 2 s demotion delay
    clock.advance(FAIL_DELAY_MS)
    df = src.poll()
    vals = _polled_values(df)
    assert vals[0]["__is_single_retry"] is True and vals[0]["v"] == 7

    # four failing attempts reschedule with exponential backoff...
    expected = [
        round((2**made - 1) * FAIL_BACKOFF_BASE_MS)
        for made in range(1, FAIL_ATTEMPTS)
    ]
    assert expected == [3000, 9000, 21000, 45000]
    for want in expected:
        got = src.retry_job(token)
        assert got == want
        clock.advance(want - 1)
        assert src.poll().count() == 0  # 1 ms early
        clock.advance(1)
        assert src.poll().count() == 1

    # ...the 5th failure exhausts the budget -> failed key
    assert src.retry_job(token) is None
    assert fake.lrange("bull:q:failed", 0, -1) == [token.encode()]
    assert fake.zcard("bull:q:delayed") == 0
    assert fake.llen("bull:q:processing:worker-1") == 0


def test_retry_job_payload_mode_requires_delay(spark):
    fake, clock = FakeRedis(), FakeClock()
    src = _source(spark, fake, clock, wire_format="payload")
    token = src.add_job({"n": 1})
    assert src.poll().count() == 1
    with pytest.raises(ValueError, match="delay_ms"):
        src.retry_job(token)
    assert src.retry_job(token, delay_ms=2500) == 2500
    assert src.poll().count() == 0
    clock.advance(2500)
    assert src.poll().count() == 1


def test_bulker_full_requeue_5s_and_data_attempt_counter(spark):
    fake, clock = FakeRedis(), FakeClock()
    src = _source(spark, fake, clock, wire_format="bull")
    src.requeue_bulker_full({"event_type": "e"})
    clock.advance(BULKER_FULL_DELAY_MS)
    (v,) = _polled_values(src.poll())
    assert v["__bulker_full_attempts"] == 1
    # a second bulker-full pass increments the DATA counter (the
    # reference leaves Bull attempts unset on this path)
    src.requeue_bulker_full(v)
    clock.advance(BULKER_FULL_DELAY_MS)
    (v2,) = _polled_values(src.poll())
    assert v2["__bulker_full_attempts"] == 2


def test_emergency_busy_requeue_random_2_to_11s(spark):
    fake, clock = FakeRedis(), FakeClock()
    src = _source(spark, fake, clock, wire_format="bull")
    # rand01 injectable: floor(r*10)+1 seconds on top of 1 s
    src.requeue_emergency_busy({"event_type": "e"}, rand01=0.0)
    assert fake.zsets["bull:q:delayed"]  # parked
    clock.advance(1999)
    assert src.poll().count() == 0
    clock.advance(1)  # 1000 + 1*1000 = 2 s lower bound
    (v,) = _polled_values(src.poll())
    assert v["__single_retry_attempts"] == 1

    src.requeue_emergency_busy(v, rand01=0.999)
    clock.advance(10_999)
    assert src.poll().count() == 0
    clock.advance(1)  # 1000 + 10*1000 = 11 s upper bound
    (v2,) = _polled_values(src.poll())
    assert v2["__single_retry_attempts"] == 2


def test_delayed_jobs_survive_crash_and_promote_after_restart(spark):
    """A consumer that parked a retry then died loses nothing: the
    delayed zset is in Redis, so a restarted consumer promotes the job
    once due (at-least-once across the delay)."""
    fake, clock = FakeRedis(), FakeClock()
    src = _source(spark, fake, clock, wire_format="bull")
    src.requeue_failed_event({"event_type": "e", "v": 1})
    del src  # crash before the delay elapses

    clock.advance(FAIL_DELAY_MS)
    src2 = _source(spark, fake, clock, wire_format="bull", consumer="w2")
    src2.salvage()
    vals = _polled_values(src2.poll())
    assert vals and vals[0]["v"] == 1
