"""Rule-based provider routing policy (planning-time, pure Python).

Re-expresses the reference's routing semantics (borsa-types/src/
routing_policy.rs:441-531 best_rule/provider_rank, :558-612 normalization,
:786-817 sort keys) as deterministic planning functions. These never touch
Spark — they decide *which source scans the generated DataFrame program
contains and in what priority order*, the analog of partition pruning done
before the plan is built.

Semantics (verified against the reference's doc + serde tests):
- A rule = (selector{symbol?, kind?, exchange?}, ordered provider list,
  strict flag). Specificity = (#set fields, symbol-bit, kind-bit,
  exchange-bit); the best matching rule is max specificity, ties broken by
  *later rule wins*.
- provider_rank: listed -> its position; unlisted under a strict rule ->
  ineligible (None); unlisted under a non-strict rule -> rank INF (after all
  listed); no rule and no global -> rank INF.
- Exchange preferences are a separate scoped map (symbol > kind > global)
  used only for search dedup ranking, never for eligibility.
"""

from __future__ import annotations

from dataclasses import dataclass, field

INF = 1 << 62  # stands in for usize::MAX; orders after any explicit rank


@dataclass(frozen=True)
class Selector:
    symbol: str | None = None
    kind: str | None = None
    exchange: str | None = None

    def specificity(self) -> tuple[int, int, int, int]:
        sb = int(self.symbol is not None)
        kb = int(self.kind is not None)
        eb = int(self.exchange is not None)
        return (sb + kb + eb, sb, kb, eb)

    def matches(self, ctx: RoutingContext) -> bool:
        if self.symbol is not None and self.symbol != ctx.symbol:
            return False
        if self.kind is not None and self.kind != ctx.kind:
            return False
        return not (self.exchange is not None and self.exchange != ctx.exchange)


@dataclass(frozen=True)
class RoutingContext:
    symbol: str | None = None
    kind: str | None = None
    exchange: str | None = None


def _dedup_keep_first(items: list[str]) -> list[str]:
    seen: set[str] = set()
    out = []
    for it in items:
        if it not in seen:
            seen.add(it)
            out.append(it)
    return out


@dataclass
class ProviderRule:
    selector: Selector
    providers: list[str]
    strict: bool = False

    def rank_of(self, key: str) -> int | None:
        try:
            return self.providers.index(key)
        except ValueError:
            return None


@dataclass
class ProviderPolicy:
    rules: list[ProviderRule] = field(default_factory=list)
    global_rule: tuple[list[str], bool] | None = None

    def add_rule(self, selector: Selector, providers: list[str],
                 strict: bool = False) -> None:
        self.rules.append(ProviderRule(selector, list(providers), strict))

    def set_global(self, providers: list[str], strict: bool = False) -> None:
        self.global_rule = (list(providers), strict)

    def best_rule(self, ctx: RoutingContext) -> ProviderRule | None:
        """Max specificity; equal specificity -> later-defined rule wins."""
        best: ProviderRule | None = None
        best_key: tuple | None = None
        for idx, rule in enumerate(self.rules):
            if not rule.selector.matches(ctx):
                continue
            key = (rule.selector.specificity(), idx)
            if best_key is None or key > best_key:
                best, best_key = rule, key
        return best

    def provider_rank(self, ctx: RoutingContext, key: str) -> tuple[int, bool] | None:
        """(rank, strict) if eligible, else None (excluded by a strict rule)."""
        rule = self.best_rule(ctx)
        if rule is not None:
            r = rule.rank_of(key)
            if r is not None:
                return (r, rule.strict)
            return None if rule.strict else (INF, False)
        if self.global_rule is not None:
            providers, strict = self.global_rule
            if key in providers:
                return (providers.index(key), strict)
            return None if strict else (INF, False)
        return (INF, False)

    def normalize_and_collect_unknown(
        self, known: set[str]
    ) -> list[tuple[Selector, list[str]]]:
        """Drop duplicates (keep first), filter unknown keys; return unknowns
        grouped by selector so the builder can reject the policy."""
        unknown: list[tuple[Selector, list[str]]] = []
        if self.global_rule is not None:
            providers, strict = self.global_rule
            missing = [p for p in providers if p not in known]
            kept = _dedup_keep_first([p for p in providers if p in known])
            self.global_rule = (kept, strict)
            if missing:
                unknown.append((Selector(), missing))
        for rule in self.rules:
            missing = [p for p in rule.providers if p not in known]
            rule.providers = _dedup_keep_first(
                [p for p in rule.providers if p in known]
            )
            if missing:
                unknown.append((rule.selector, missing))
        return unknown


@dataclass
class RoutingPolicy:
    """Provider rules + exchange preferences (search-dedup ranking only)."""

    providers: ProviderPolicy = field(default_factory=ProviderPolicy)
    # scope -> ordered exchange list; scope is ("global",), ("kind", k),
    # ("symbol", s). Resolution: symbol > kind > global.
    exchanges: dict[tuple, list[str]] = field(default_factory=dict)

    # -- builder-style helpers (later calls for the same scope overwrite) --

    def providers_global(self, providers: list[str], strict: bool = False):
        self.providers.set_global(providers, strict)
        return self

    def providers_for_kind(self, kind: str, providers: list[str],
                           strict: bool = False):
        self.providers.add_rule(Selector(kind=kind), providers, strict)
        return self

    def providers_for_symbol(self, symbol: str, providers: list[str],
                             strict: bool = False):
        self.providers.add_rule(Selector(symbol=symbol), providers, strict)
        return self

    def providers_for_exchange(self, exchange: str, providers: list[str],
                               strict: bool = False):
        self.providers.add_rule(Selector(exchange=exchange), providers, strict)
        return self

    def providers_rule(self, selector: Selector, providers: list[str],
                       strict: bool = False):
        self.providers.add_rule(selector, providers, strict)
        return self

    def exchanges_global(self, exchanges: list[str]):
        self.exchanges[("global",)] = list(exchanges)
        return self

    def exchanges_for_kind(self, kind: str, exchanges: list[str]):
        self.exchanges[("kind", kind)] = list(exchanges)
        return self

    def exchanges_for_symbol(self, symbol: str, exchanges: list[str]):
        self.exchanges[("symbol", symbol)] = list(exchanges)
        return self

    # -- evaluation --

    def provider_sort_key(self, ctx: RoutingContext, key: str,
                          orig_idx: int) -> tuple[int, int]:
        r = self.providers.provider_rank(ctx, key)
        rank = r[0] if r is not None else INF
        return (rank, orig_idx)

    def exchange_rank_map(self, ctx: RoutingContext) -> dict[str, int] | None:
        for scope in (("symbol", ctx.symbol), ("kind", ctx.kind), ("global",)):
            if scope in self.exchanges:
                return {e: i for i, e in enumerate(self.exchanges[scope])}
        return None

    def exchange_sort_key(
        self, ctx: RoutingContext, exchange: str | None, orig_idx: int
    ) -> tuple[int, int, int, int]:
        """(pref_rank, none_penalty, reserved, orig_idx) — lower wins."""
        none_penalty = 0 if exchange is not None else INF
        rank_map = self.exchange_rank_map(ctx)
        rank = INF
        if exchange is not None and rank_map is not None:
            rank = rank_map.get(exchange, INF)
        return (rank, none_penalty, INF, orig_idx)

    # -- config round-trip (routing_policy serde parity,
    #    borsa-types/tests/routing_policy_serde.rs) --

    def to_dict(self) -> dict:
        return {
            "rules": [
                {
                    "selector": {
                        "symbol": r.selector.symbol,
                        "kind": r.selector.kind,
                        "exchange": r.selector.exchange,
                    },
                    "providers": list(r.providers),
                    "strict": r.strict,
                }
                for r in self.providers.rules
            ],
            "global": (
                {"providers": self.providers.global_rule[0],
                 "strict": self.providers.global_rule[1]}
                if self.providers.global_rule is not None
                else None
            ),
            "exchanges": [
                {"scope": list(scope), "exchanges": lst}
                for scope, lst in self.exchanges.items()
            ],
        }

    @classmethod
    def from_dict(cls, d: dict) -> RoutingPolicy:
        p = cls()
        g = d.get("global")
        if g is not None:
            p.providers.set_global(g["providers"], g.get("strict", False))
        for r in d.get("rules", []):
            sel = r.get("selector", {})
            p.providers.add_rule(
                Selector(
                    symbol=sel.get("symbol"),
                    kind=sel.get("kind"),
                    exchange=sel.get("exchange"),
                ),
                r["providers"],
                r.get("strict", False),
            )
        for e in d.get("exchanges", []):
            p.exchanges[tuple(e["scope"])] = list(e["exchanges"])
        return p
