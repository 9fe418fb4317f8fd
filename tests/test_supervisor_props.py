"""Model-based property test for the supervisor state machine — the port of
the reference's stateful stream model props
(borsa/tests/router/stream/router_stream_model_prop.rs shape): drive the SM
with random event walks and assert structural invariants after every step.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from borsa_spark.errors import ProviderTimeout
from borsa_spark.streaming import (
    BackoffTick,
    NotifyInitial,
    PreemptSessions,
    PState,
    RequestStart,
    ScheduleBackoffTick,
    SessionEnded,
    StartFailed,
    StartSucceeded,
    make_supervisor,
)

N_PROVIDERS = 3
SYMBOLS = ["A", "B", "C"]

# a step: which provider event to fire next
step_st = st.one_of(
    st.just(("tick",)),
    st.tuples(st.just("succeed"), st.integers(0, N_PROVIDERS - 1)),
    st.tuples(st.just("fail"), st.integers(0, N_PROVIDERS - 1)),
    st.tuples(st.just("end"), st.integers(0, N_PROVIDERS - 1)),
)


@settings(max_examples=200, deadline=None)
@given(steps=st.lists(step_st, min_size=1, max_size=30))
def test_supervisor_invariants_under_random_walk(steps):
    sm = make_supervisor(
        [list(SYMBOLS) for _ in range(N_PROVIDERS)],
        min_backoff_ms=100,
        max_backoff_ms=1600,
        factor=2,
    )
    connecting: set[int] = set()  # providers with an outstanding start request

    def run(event):
        nonlocal sm
        sm, actions = sm.handle(event)
        # --- invariants on the action list ---
        # Batch position of each provider's own start this round: the
        # planner scans from the round-robin cursor and marks providers
        # Connecting AS IT GOES (supervisor_sm.rs:200-241), so a start's
        # coverage rule must be judged against PLAN-TIME state — providers
        # whose own start appears later in the same batch were still idle
        # when this one was computed.
        start_pos = {
            a.id: k
            for k, a in enumerate(actions)
            if isinstance(a, RequestStart)
        }
        for k, a in enumerate(actions):
            if isinstance(a, RequestStart):
                p = sm.providers[a.id]
                # a start request marks the provider Connecting with exactly
                # the requested symbols, all allowed and required
                assert p.state is PState.CONNECTING
                assert p.symbols == a.symbols
                assert set(a.symbols) <= set(sm.provider_allow[a.id])
                assert set(a.symbols) <= set(sm.required_symbols)
                assert len(a.symbols) > 0
                # coverage planning (supervisor_sm.rs:304-328): a requested
                # symbol is never already covered by an EARLIER-in-chain
                # (higher-priority) provider that was already Active or
                # Connecting when this start was planned. Overlap with
                # LOWER-priority coverage is deliberate (failback: the
                # primary reconnects, then preempts on success), and so is
                # overlap with a higher-priority provider started LATER in
                # this same batch — the cursor-ordered scan reaches the
                # lower-priority provider first while the higher one is
                # still idle; when both connect, the higher one's
                # activation preempts the lower (failback race).
                for j, pj in enumerate(sm.providers):
                    if j < a.id and pj.state in (
                        PState.ACTIVE, PState.CONNECTING,
                    ):
                        if start_pos.get(j, -1) > k:
                            continue  # started after this one was planned
                        assert not (set(a.symbols) & set(pj.symbols))
                connecting.add(a.id)
            elif isinstance(a, ScheduleBackoffTick):
                assert sm.min_backoff_ms <= a.delay_ms <= sm.max_backoff_ms
            elif isinstance(a, PreemptSessions):
                for pid in a.provider_ids:
                    # only lower-priority (higher index) overlapping actives
                    # are preempted; by the time the action list is emitted
                    # they are still marked ACTIVE (controller stops them)
                    assert sm.providers[pid].state is PState.ACTIVE
        # --- global invariants ---
        assert sm.min_backoff_ms <= sm.backoff_ms <= sm.max_backoff_ms
        return actions

    run(BackoffTick())  # arm the first round
    for step in steps:
        if step[0] == "tick":
            run(BackoffTick())
        else:
            kind, pid = step
            p = sm.providers[pid]
            if kind == "succeed" and p.state is PState.CONNECTING:
                connecting.discard(pid)
                was_terminal = sm.phase.value in ("terminated", "shutting_down")
                run(StartSucceeded(id=pid, symbols=p.symbols))
                if was_terminal:
                    # startup can terminate (all failed + round exhausted,
                    # supervisor_sm.rs:369-377) while a retried provider
                    # still has an in-flight start; the late success is a
                    # no-op — matches the reference's terminal-phase guard
                    assert sm.providers[pid].state is PState.CONNECTING
                else:
                    assert sm.providers[pid].state is PState.ACTIVE
            elif kind == "fail" and p.state is PState.CONNECTING:
                connecting.discard(pid)
                run(StartFailed(id=pid, error=ProviderTimeout("x")))
                if sm.phase.value != "terminated":
                    assert sm.providers[pid].state in (
                        PState.IN_COOLDOWN, PState.CONNECTING,
                    )
            elif kind == "end" and p.state is PState.ACTIVE:
                run(SessionEnded(id=pid))
                assert sm.providers[pid].state in (
                    PState.IN_COOLDOWN, PState.CONNECTING,
                )
