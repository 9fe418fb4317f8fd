"""Stream controller: executes supervisor actions against real sessions
(T4-T7 wiring, T10 graceful shutdown).

Reference: borsa/src/router/streaming/controller.rs — the event loop that
feeds the pure state machine and executes its actions (start provider
sessions, stop/preempt, schedule backoff ticks, notify the init barrier).

Our sessions are Spark StreamingQuery handles (or anything exposing
``stop()``): `start_fn(provider, symbols)` builds and starts the
per-provider streaming query; failures surface as StartFailed events. Time
is explicit — `advance_ms()` fires due backoff ticks — so the controller is
deterministic under test and driven by a wall-clock loop (or a
StreamingQueryListener) in production.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from typing import Any, Callable

from borsa_spark.errors import BorsaSparkError
from borsa_spark.streaming.supervisor import (
    BackoffTick,
    NotifyInitial,
    PreemptSessions,
    RequestStart,
    ScheduleBackoffTick,
    SessionEnded,
    Shutdown,
    StartFailed,
    StartSucceeded,
    StopAll,
    Supervisor,
    jitter_wait,
)

StartFn = Callable[[str, tuple[str, ...]], Any]
StopFn = Callable[[str, Any], None]


def _default_stop(name: str, handle: Any) -> None:
    stop = getattr(handle, "stop", None)
    if callable(stop):
        stop()


@dataclass
class StreamController:
    """One supervisor + its live sessions."""

    sm: Supervisor
    providers: list[str]                       # index-aligned with sm
    start_fn: StartFn
    stop_fn: StopFn = _default_stop
    jitter_percent: int = 20
    rng: random.Random = field(default_factory=lambda: random.Random(0))

    sessions: dict[int, Any] = field(default_factory=dict)
    now_ms: int = 0
    pending_ticks: list[int] = field(default_factory=list)
    initial_result: tuple[bool, BorsaSparkError | None] | None = None
    stopped: bool = False

    def kick(self) -> None:
        """Start the first round (the reference arms an immediate tick)."""
        self._handle(BackoffTick())

    # -- event intake -------------------------------------------------------

    def _handle(self, event: Any) -> None:
        self.sm, actions = self.sm.handle(event)
        self._execute(actions)

    def session_ended(self, provider: str) -> None:
        """Report a session end (query terminated); enters cooldown."""
        pid = self.providers.index(provider)
        self.sessions.pop(pid, None)
        self._handle(SessionEnded(id=pid))

    def shutdown(self) -> None:
        self._handle(Shutdown())

    def advance_ms(self, ms: int) -> None:
        """Advance the controller clock, firing due backoff ticks."""
        self.now_ms += ms
        due = [t for t in self.pending_ticks if t <= self.now_ms]
        self.pending_ticks = [t for t in self.pending_ticks if t > self.now_ms]
        for _ in due:
            if not self.stopped:
                self._handle(BackoffTick())

    # -- action execution (controller.rs:240-290) ---------------------------

    def _execute(self, actions: list[Any]) -> None:
        for a in actions:
            if isinstance(a, RequestStart):
                try:
                    handle = self.start_fn(self.providers[a.id], a.symbols)
                except BorsaSparkError as e:
                    self._handle(StartFailed(id=a.id, error=e))
                    continue
                self.sessions[a.id] = handle
                self._handle(StartSucceeded(id=a.id, symbols=a.symbols))
            elif isinstance(a, PreemptSessions):
                # stop lower-priority overlapping sessions; preemption is a
                # deliberate stop, not a failure -> cooldown via SessionEnded
                # (controller.rs:251-264)
                for pid in a.provider_ids:
                    h = self.sessions.pop(pid, None)
                    if h is not None:
                        self.stop_fn(self.providers[pid], h)
                    self._handle(SessionEnded(id=pid))
            elif isinstance(a, ScheduleBackoffTick):
                delay = jitter_wait(a.delay_ms, self.jitter_percent, self.rng)
                self.pending_ticks.append(self.now_ms + delay)
            elif isinstance(a, NotifyInitial):
                if self.initial_result is None:
                    self.initial_result = (a.ok, a.error)
            elif isinstance(a, StopAll):
                for pid, h in list(self.sessions.items()):
                    self.stop_fn(self.providers[pid], h)
                self.sessions.clear()
                self.stopped = True


def launch_plan(
    plan,
    start_fn: StartFn,
    stop_fn: StopFn = _default_stop,
    min_backoff_ms: int = 500,
    max_backoff_ms: int = 30_000,
    factor: int = 2,
    jitter_percent: int = 20,
    rng: random.Random | None = None,
) -> StreamController:
    """Build and kick a controller for one SupervisorPlan."""
    sm = plan.build_supervisor(
        min_backoff_ms=min_backoff_ms,
        max_backoff_ms=max_backoff_ms,
        factor=factor,
    )
    ctl = StreamController(
        sm=sm,
        providers=list(plan.providers),
        start_fn=start_fn,
        stop_fn=stop_fn,
        jitter_percent=jitter_percent,
        rng=rng or random.Random(0),
    )
    ctl.kick()
    return ctl
