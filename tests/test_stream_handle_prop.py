"""Property-based stop/drop race coverage for the stream controller — the
Python analog of the reference's loom model check
(/root/reference/borsa-core/tests/loom_stream_handle.rs): arbitrary
interleavings of session deaths, backoff ticks, start failures, and
shutdown must never leak a session handle, double-start a provider, or
resurrect anything after shutdown.

No Spark session needed: sessions are fakes, time is the controller's
explicit clock — the whole state space is deterministic per seed.
"""

from __future__ import annotations

import threading

from hypothesis import given, settings
from hypothesis import strategies as st

from borsa_spark.errors import ProviderTimeout
from borsa_spark.plans import RoutingPolicy
from borsa_spark.sources.provider import Catalog, Source
from borsa_spark.streaming import StreamInstrument, launch_plan, plan_stream

I = StreamInstrument


class Handle:
    def __init__(self, provider: str):
        self.provider = provider
        self.stopped = False
        self.released = False  # popped via session_ended (query died)

    def stop(self):
        self.stopped = True


class Harness:
    """Controller + bookkeeping for the leak/liveness invariants."""

    def __init__(self, n_providers: int = 3):
        cat = Catalog()
        self.providers = [f"p{i}" for i in range(n_providers)]
        for p in self.providers:
            cat.register(Source(name=p, tables={"stream_quotes": object()}))
        cat.policy = RoutingPolicy().providers_for_symbol(
            "AAPL", self.providers
        )
        plans = plan_stream(cat, [I("AAPL")])
        assert len(plans) == 1
        self.created: list[Handle] = []
        self.fail_next = False

        def start_fn(name, symbols):
            if self.fail_next:
                raise ProviderTimeout("injected", connector=name)
            h = Handle(name)
            self.created.append(h)
            return h

        def stop_fn(name, handle):
            handle.stop()

        self.ctl = launch_plan(
            plans[0], start_fn, stop_fn,
            min_backoff_ms=100, jitter_percent=0,
        )

    def end_session(self, pid: int) -> None:
        h = self.ctl.sessions.get(pid)
        if h is not None:
            h.released = True
            self.ctl.session_ended(self.providers[pid])

    def check_invariants(self) -> None:
        ctl = self.ctl
        # 1. no leaked handles: every created handle is live, stopped, or
        #    released by its own death — never silently abandoned
        live = set(map(id, ctl.sessions.values()))
        for h in self.created:
            assert h.stopped or h.released or id(h) in live, (
                f"leaked session for {h.provider}"
            )
        # 2. at most one live session per provider slot
        assert len(ctl.sessions) <= len(self.providers)
        # 3. stopped is terminal: no sessions survive shutdown
        if ctl.stopped:
            assert not ctl.sessions
        # 4. the init barrier fires at most once and is sticky
        assert ctl.initial_result is not None


EVENTS = st.lists(
    st.one_of(
        st.tuples(st.just("end"), st.integers(0, 2)),
        st.tuples(st.just("tick"), st.integers(1, 200_000)),
        st.tuples(st.just("fail"), st.booleans()),
        st.tuples(st.just("stop"), st.just(0)),
    ),
    max_size=40,
)


class TestControllerRaces:
    @settings(max_examples=200, deadline=None)
    @given(events=EVENTS)
    def test_random_interleavings_never_leak(self, events):
        h = Harness()
        for kind, arg in events:
            if kind == "end":
                h.end_session(arg)
            elif kind == "tick":
                h.ctl.advance_ms(arg)
            elif kind == "fail":
                h.fail_next = arg
            elif kind == "stop":
                h.ctl.shutdown()
            h.check_invariants()
        h.ctl.shutdown()
        h.check_invariants()
        # post-shutdown events are no-ops: nothing restarts
        n_created = len(h.created)
        h.ctl.advance_ms(10_000_000)
        h.end_session(0)
        h.ctl.shutdown()
        assert len(h.created) == n_created and not h.ctl.sessions

    @settings(max_examples=50, deadline=None)
    @given(events=EVENTS)
    def test_shutdown_mid_sequence_is_terminal(self, events):
        h = Harness()
        h.ctl.shutdown()
        for kind, arg in events:
            if kind == "end":
                h.end_session(arg)
            elif kind == "tick":
                h.ctl.advance_ms(arg)
        assert not h.ctl.sessions and h.ctl.stopped
        assert all(x.stopped or x.released for x in h.created)

    def test_concurrent_stop_and_session_end_threads(self):
        """The loom scenario proper: stop() racing a session death and a
        second stop() — idempotent, exception-free, everything released."""
        for _ in range(50):
            h = Harness()
            barrier = threading.Barrier(3)

            def stopper():
                barrier.wait()
                h.ctl.shutdown()

            def ender():
                barrier.wait()
                try:
                    h.end_session(0)
                except ValueError:
                    pass  # provider index raced away — acceptable
                h.ctl.advance_ms(500)

            threads = [
                threading.Thread(target=stopper),
                threading.Thread(target=stopper),
                threading.Thread(target=ender),
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=10)
                assert not t.is_alive()
            h.ctl.shutdown()
            assert h.ctl.stopped and not h.ctl.sessions
            assert all(x.stopped or x.released for x in h.created)
