"""Stream planning: grouping, eligibility scoring, strict rejection, and
per-symbol primary assignment (T2, T3, P8, U2-U4).

Reference: borsa/src/router/stream.rs:16-326 (the planning half) and
borsa/src/router/streaming/planner.rs:244-316 (eligibility scoring). Pure
Python — the output is a list of SupervisorPlans, each of which the
controller turns into one Supervisor state machine driving per-provider
Spark streaming queries.

Semantics:
- instruments are grouped by (kind, exchange) into independent supervised
  groups (stream.rs:41-51);
- per group, providers with the stream capability and kind support are
  scored by their MINIMUM per-symbol routing rank over the requested
  symbols, keeping the per-provider allowed-symbol sets; sort by
  (min_rank, registration_idx) (planner.rs:244-316);
- requested symbols not allowed for ANY capable provider are *strictly
  rejected* — error listing them (stream.rs:85-125, P8/U3);
- if any (symbol, provider) pair has an explicit rank (not INF), the group
  runs in per-symbol-primary mode: each symbol is assigned its best-ranked
  provider; one supervisor per primary with the chain ordered primary-first
  (stream.rs:144-242); otherwise one group-level fallback supervisor
  (stream.rs:242-287).
"""

from __future__ import annotations

from dataclasses import dataclass

from borsa_spark.errors import BorsaSparkError, UnsupportedError
from borsa_spark.plans.routing_policy import INF, RoutingContext
from borsa_spark.sources.provider import Catalog
from borsa_spark.streaming.supervisor import Supervisor, make_supervisor


class StrictSymbolsRejected(BorsaSparkError):
    """Symbols excluded by strict routing rules (stream.rs:108-125)."""

    def __init__(self, rejected: list[str]):
        self.rejected = sorted(rejected)
        super().__init__(f"symbols rejected by strict routing: {self.rejected}")


@dataclass(frozen=True)
class StreamInstrument:
    symbol: str
    kind: str = "EQUITY"
    exchange: str | None = None


@dataclass
class SupervisorPlan:
    """One supervisor's worth of work: ordered provider chain + symbol sets."""

    kind: str
    exchange: str | None
    providers: list[str]                    # chain order (primary first)
    provider_symbols: list[set[str]]        # allow-set per provider (aligned)
    required_symbols: set[str]
    primary: str | None = None              # set in per-symbol-primary mode

    def build_supervisor(self, **backoff) -> Supervisor:
        return make_supervisor(
            provider_symbols=[sorted(s) for s in self.provider_symbols],
            provider_allow=[set(s) for s in self.provider_symbols],
            required=set(self.required_symbols),
            **backoff,
        )


def _score_group(
    catalog: Catalog,
    capability: str,
    kind: str,
    exchange: str | None,
    symbols: list[str],
) -> tuple[list[str], list[set[str]], set[str]]:
    """(providers ordered, per-provider allowed symbols, union) —
    planner.rs:244-316."""
    scored = []
    for reg_idx, source in enumerate(catalog.sources):
        if not source.supports(capability) or not source.supports_kind(kind):
            continue
        allowed: set[str] = set()
        min_rank = INF
        for sym in symbols:
            ctx = RoutingContext(symbol=sym, kind=kind, exchange=exchange)
            r = catalog.policy.providers.provider_rank(ctx, source.name)
            if r is not None:
                allowed.add(sym)
                min_rank = min(min_rank, r[0])
        if allowed:
            scored.append((min_rank, reg_idx, source.name, allowed))
    scored.sort(key=lambda t: (t[0], t[1]))
    providers = [name for _, _, name, _ in scored]
    provider_symbols = [syms for _, _, _, syms in scored]
    union: set[str] = set()
    for s in provider_symbols:
        union |= s
    return providers, provider_symbols, union


def _check_strict_rejection(
    catalog: Catalog,
    capability: str,
    kind: str,
    exchange: str | None,
    rejected: set[str],
) -> None:
    """A rejected symbol is a strict rejection iff no capable provider has
    ANY rank for it (stream.rs:88-121)."""
    candidates = [
        s for s in catalog.sources
        if s.supports(capability) and s.supports_kind(kind)
    ]
    if not candidates:
        return
    strict = []
    for sym in rejected:
        ctx = RoutingContext(symbol=sym, kind=kind, exchange=exchange)
        if not any(
            catalog.policy.providers.provider_rank(ctx, c.name) is not None
            for c in candidates
        ):
            strict.append(sym)
    if strict:
        raise StrictSymbolsRejected(strict)


def plan_stream(
    catalog: Catalog,
    instruments: list[StreamInstrument],
    capability: str = "stream_quotes",
) -> list[SupervisorPlan]:
    """Full stream planning: list of SupervisorPlans, one per group (or per
    per-symbol primary within a group)."""
    if not instruments:
        raise ValueError("instruments list cannot be empty")

    groups: dict[tuple[str, str | None], list[str]] = {}
    for inst in instruments:
        groups.setdefault((inst.kind, inst.exchange), []).append(inst.symbol)

    plans: list[SupervisorPlan] = []
    any_group_planned = False
    for (kind, exchange), symbols in groups.items():
        providers, provider_symbols, union = _score_group(
            catalog, capability, kind, exchange, symbols
        )
        if not union:
            # No capable provider allows anything here; strict rejection if
            # rules exclude, else unsupported is raised after the loop.
            _check_strict_rejection(
                catalog, capability, kind, exchange, set(symbols)
            )
            continue

        requested = set(symbols)
        rejected = requested - union
        if rejected:
            _check_strict_rejection(catalog, capability, kind, exchange, rejected)

        # explicit-rank detection (stream.rs:127-142)
        group_has_explicit = False
        for sym in symbols:
            ctx = RoutingContext(symbol=sym, kind=kind, exchange=exchange)
            for name in providers:
                r = catalog.policy.providers.provider_rank(ctx, name)
                if r is not None and r[0] != INF:
                    group_has_explicit = True
                    break
            if group_has_explicit:
                break

        if group_has_explicit:
            # per-symbol best provider (rank, provider position) ->
            # primary groups (stream.rs:144-177)
            primary_groups: dict[int, set[str]] = {}
            for sym in sorted(requested & union):
                ranked = []
                for idx, name in enumerate(providers):
                    if sym not in provider_symbols[idx]:
                        continue
                    ctx = RoutingContext(symbol=sym, kind=kind, exchange=exchange)
                    r = catalog.policy.providers.provider_rank(ctx, name)
                    if r is not None:
                        ranked.append((r[0], idx))
                if not ranked:
                    continue
                ranked.sort()
                primary_groups.setdefault(ranked[0][1], set()).add(sym)

            for primary_idx, group_syms in sorted(primary_groups.items()):
                chain = [primary_idx] + [
                    j for j in range(len(providers)) if j != primary_idx
                ]
                plans.append(
                    SupervisorPlan(
                        kind=kind,
                        exchange=exchange,
                        providers=[providers[j] for j in chain],
                        provider_symbols=[
                            provider_symbols[j] & group_syms for j in chain
                        ],
                        required_symbols=set(group_syms),
                        primary=providers[primary_idx],
                    )
                )
        else:
            plans.append(
                SupervisorPlan(
                    kind=kind,
                    exchange=exchange,
                    providers=list(providers),
                    provider_symbols=[set(s) for s in provider_symbols],
                    required_symbols=requested & union,
                )
            )
        any_group_planned = True

    if not any_group_planned:
        raise UnsupportedError(f"{capability}: no eligible stream provider")
    return plans
