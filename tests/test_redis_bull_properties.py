"""Property-based check of the S1 at-least-once protocol, both wire
formats: under ANY interleaving of produce / poll-then-crash /
poll-commit-crash-before-ack / poll-commit-ack / consumer-restart-
salvage, a final salvage+drain delivers EVERY produced payload at
least once, never strands a job in Redis, and (bull mode) never
leaves an acked job hash behind. Complements the hand-written crash
scenarios in tests/test_redis_bull_source.py."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from redis_events_to_clickhouse_tables_spark.sources.redis_bull import (
    RedisBullSource,
)

from .test_redis_bull_source import FakeRedis, _add_bull_job

op = st.one_of(
    st.tuples(st.just("produce"), st.integers(min_value=1, max_value=4)),
    st.tuples(st.just("poll_crash"), st.just(0)),
    st.tuples(st.just("poll_commit_crash"), st.just(0)),
    st.tuples(st.just("poll_commit_ack"), st.just(0)),
    st.tuples(st.just("restart_salvage"), st.just(0)),
)


def _produce(fake, wire_format, n, counter):
    for _ in range(n):
        i = next(counter)
        payload = {"event_type": "event_session", "n": i}
        if wire_format == "bull":
            _add_bull_job(fake, "q", payload)
        else:
            fake.rpush("bull:q:wait", json.dumps(payload))
        yield i


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(op, min_size=1, max_size=12), st_wire=st.booleans())
def test_any_interleaving_is_at_least_once(spark, ops, st_wire):
    wire = "bull" if st_wire else "payload"
    fake = FakeRedis()
    counter = iter(range(10**6))
    produced: set[int] = set()
    delivered: list[int] = []
    src = RedisBullSource(
        spark, queue="q", client=fake, max_batch=3, wire_format=wire
    )

    def new_consumer():
        # a restarted consumer (same name) salvages its predecessor
        s = RedisBullSource(
            spark, queue="q", client=fake, max_batch=3, wire_format=wire
        )
        s.salvage()
        return s

    for kind, arg in ops:
        if kind == "produce":
            produced.update(_produce(fake, wire, arg, counter))
        elif kind == "poll_crash":
            src.poll()  # consumer dies before commit
            src = new_consumer()
        elif kind == "poll_commit_crash":
            src.poll()
            # commit succeeded (payloads handed downstream), crash
            # before ack: downstream idempotence absorbs the replay
            delivered.extend(
                json.loads(p)["n"] for p in src._inflight_payloads
            )
            src = new_consumer()
        elif kind == "poll_commit_ack":
            src.poll()
            delivered.extend(
                json.loads(p)["n"] for p in src._inflight_payloads
            )
            src.ack()
        elif kind == "restart_salvage":
            src = new_consumer()

    # final drain: restart once more, then poll-commit-ack to empty
    src = new_consumer()
    while True:
        src.poll()
        if not src._inflight:
            break
        delivered.extend(json.loads(p)["n"] for p in src._inflight_payloads)
        src.ack()

    # at-least-once: every produced payload delivered >= 1 time
    assert set(delivered) >= produced
    # nothing delivered that was never produced
    assert set(delivered) <= produced
    # no job stranded anywhere in Redis
    assert fake.llen("bull:q:wait") == 0
    assert fake.llen("bull:q:processing:worker-1") == 0
    if wire == "bull":
        # every job hash was deleted on ack (removeOnComplete)
        assert not any(
            k.startswith("bull:q:") and k[7:].isdigit() for k in fake.hashes
            if fake.hashes[k]
        ), fake.hashes
