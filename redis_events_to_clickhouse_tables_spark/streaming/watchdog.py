"""B5: liveness watchdog — detect a stalled streaming query and react.

Reference parity: the worker arms a watchdog timer around every queue
tick and kills the process if no tick completes within the configured
window, relying on the process manager to restart it
(src/main.ts:551-644, ``WATCH_DOG_*`` in .env.sample). Crash-replay
safety is already covered here by checkpointing (offsets commit only
after a batch succeeds), so the one missing behavior was *detection*:
a hung batch (e.g. a sink that accepts connections but never
completes a write) never terminates the query, so ``awaitTermination``
alone would hang forever exactly like the reference's stuck tick.

Spark-first shape: a ``StreamingQueryListener`` records the last
sign of life per query — started / progress / idle events all count
(an idle tick means the trigger fired and found no data: alive) — and
a daemon thread flags any tracked query silent for longer than the
timeout. The reaction is a callback: the worker entrypoint
(``__main__``) stops the stalled query and rebuilds it from the same
checkpoint, which replays the uncommitted batch — the in-process
equivalent of the reference's exit-and-let-Docker-restart.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class StallWatchdog(StreamingQueryListener):
    """Flags queries that emit no event for ``timeout_s`` seconds.

    ``on_stall(run_id)`` fires once per silent period (the clock
    resets after each firing so a recovered query can be flagged again
    later, but a dead one isn't flagged every poll).
    """

    def __init__(
        self,
        spark: SparkSession,
        timeout_s: float,
        on_stall: Callable[[str], None],
        poll_s: float = 1.0,
    ):
        self.spark = spark
        self.timeout_s = timeout_s
        self.on_stall = on_stall
        self.poll_s = poll_s
        self._last_seen: dict[str, float] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.stalls: list[str] = []  # observability: every flagged id

    # -- listener callbacks (JVM event bus -> Python) --------------------
    # keyed by runId, not id: a checkpointed query keeps its id across
    # restarts, so only runId distinguishes a replaced (possibly
    # still-hung) incarnation from its healthy successor
    def _mark(self, run_id) -> None:
        with self._lock:
            self._last_seen[str(run_id)] = time.monotonic()

    def onQueryStarted(self, event) -> None:  # noqa: N802 — Spark API
        self._mark(event.runId)

    def onQueryProgress(self, event) -> None:  # noqa: N802
        self._mark(event.progress.runId)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        # an idle trigger IS liveness: the loop ran and found no data
        self._mark(event.runId)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        with self._lock:
            self._last_seen.pop(str(event.runId), None)

    # -- monitor ----------------------------------------------------------
    def _monitor(self) -> None:
        while not self._stop.wait(self.poll_s):
            now = time.monotonic()
            with self._lock:
                stalled = [
                    qid
                    for qid, ts in self._last_seen.items()
                    if now - ts > self.timeout_s
                ]
                for qid in stalled:
                    self._last_seen[qid] = now  # one firing per silence
            for qid in stalled:
                self.stalls.append(qid)
                try:
                    self.on_stall(qid)
                except Exception:  # noqa: BLE001 — watchdog must not die
                    pass

    def start(self) -> "StallWatchdog":
        self.spark.streams.addListener(self)
        self._thread = threading.Thread(
            target=self._monitor, name="stall-watchdog", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        try:
            self.spark.streams.removeListener(self)
        except Exception:  # noqa: BLE001 — already removed / session gone
            pass
