"""Property-based tests (Hypothesis) — ports of the reference's proptest
layer (borsa-core/tests/resample_props.rs, merge_props.rs, dedup_props.rs,
interval_infer.rs): Spark operators vs pure-Python reference models.

Each example packs many random series into ONE DataFrame (symbol = series
index) so a property run costs a handful of Spark jobs, not hundreds.
"""

from __future__ import annotations

from collections import defaultdict
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from borsa_spark.operators import (
    dedup_actions,
    estimate_step_seconds,
    merge_history,
    monotonic_gate,
)
from borsa_spark.operators.resample import resample_to_daily
from tests.conftest import action, candle, make_actions, make_candles, ts

DAY = 86_400

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


# one series: list of (sec, open, volume_or_None) with distinct secs
series_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5 * DAY),
        st.integers(min_value=1, max_value=9999).map(lambda v: v / 100),
        st.one_of(st.none(), st.integers(min_value=0, max_value=1000)),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)

batch_st = st.lists(series_st, min_size=1, max_size=6)


def _build(spark, batch, provider="provA"):
    rows = []
    for si, series in enumerate(batch):
        for seq, (sec, o, vol) in enumerate(series):
            rows.append(
                candle(provider, symbol=f"S{si}", sec=sec, o=o, h=o + 1,
                       l=max(o - 1, 0), c=o + 0.5, volume=vol, seq=seq)
            )
    return make_candles(spark, rows)


class TestResampleProps:
    @SETTINGS
    @given(batch=batch_st)
    def test_daily_ohlc_matches_model_and_is_idempotent(self, spark, batch):
        df = _build(spark, batch)
        out = resample_to_daily(df)
        got = {
            (r.symbol, r.ts): (
                float(r.open), float(r.high), float(r.low), float(r.close),
                r.volume,
            )
            for r in out.collect()
        }
        # pure-python model (resample.rs:26-121 OHLC rules)
        want = {}
        for si, series in enumerate(batch):
            buckets = defaultdict(list)
            for seq, (sec, o, vol) in enumerate(series):
                buckets[sec // DAY].append((sec, seq, o, vol))
            for day, items in buckets.items():
                items.sort(key=lambda t: (t[0], t[1]))
                vols = [v for *_, v in items if v is not None]
                want[(f"S{si}", ts(day * DAY))] = (
                    items[0][2],                       # open = first
                    max(i[2] + 1 for i in items),      # high
                    min(max(i[2] - 1, 0) for i in items),  # low
                    items[-1][2] + 0.5,                # close = last
                    sum(vols) if vols else None,       # NULL-ignoring sum
                )
        assert {k: tuple(round(x, 6) if isinstance(x, float) else x for x in v)
                for k, v in got.items()} == \
               {k: tuple(round(x, 6) if isinstance(x, float) else x for x in v)
                for k, v in want.items()}

        # idempotence (resample_props.rs:66-92)
        again = {
            (r.symbol, r.ts): (float(r.open), float(r.high), float(r.low),
                               float(r.close), r.volume)
            for r in resample_to_daily(out).collect()
        }
        assert again == got


two_provider_st = st.tuples(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(1, 999)),
        min_size=0, max_size=8, unique_by=lambda t: t[0],
    ),
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(1, 999)),
        min_size=0, max_size=8, unique_by=lambda t: t[0],
    ),
    st.booleans(),  # provA adjusted
    st.booleans(),  # provB adjusted
)


class TestMergeProps:
    @SETTINGS
    @given(data=two_provider_st)
    def test_first_wins_sorted_and_flags(self, spark, data):
        a_rows, b_rows, a_adj, b_adj = data
        rows = [
            candle("provA", sec=sec * DAY, o=v, adjusted=a_adj, seq=i)
            for i, (sec, v) in enumerate(a_rows)
        ] + [
            candle("provB", sec=sec * DAY, o=v, adjusted=b_adj, seq=i)
            for i, (sec, v) in enumerate(b_rows)
        ]
        if not rows:
            return
        df = make_candles(spark, rows)
        merged, _, flags = merge_history(
            df, priorities={"provA": 0, "provB": 1}
        )
        out = merged.orderBy("ts").collect()

        # model: first-wins by priority then seq (merge_props.rs:51-72)
        want = {}
        for prio, (prov, rws) in enumerate([("provA", a_rows), ("provB", b_rows)]):
            for sec, v in rws:
                key = sec * DAY
                if key not in want or prio < want[key][0]:
                    want[key] = (prio, prov, v)
        assert [r.ts for r in out] == [ts(k) for k in sorted(want)]
        for r in out:
            k = int(r.ts.timestamp())
            assert (str(r.provider), float(r.open)) == (want[k][1], float(want[k][2]))
            assert r.close_unadj is None  # cleared (merge.rs:94-95)

        # adjusted = AND over *contributing* providers (merge_props.rs:74+)
        contributing = {want[k][1] for k in want}
        expect_adj = all(
            {"provA": a_adj, "provB": b_adj}[p] for p in contributing
        )
        frow = flags.collect()
        if frow:
            assert frow[0].adjusted == expect_adj


actions_st = st.lists(
    st.tuples(
        st.integers(0, 3),                      # ts day
        st.sampled_from(["dividend", "split", "capital_gain"]),
        st.integers(1, 5),                      # amount / numerator
    ),
    min_size=0,
    max_size=12,
)


class TestDedupProps:
    @SETTINGS
    @given(acts=actions_st)
    def test_dedup_idempotent_and_canonical_unique(self, spark, acts):
        rows = []
        for day, kind, amt in acts:
            if kind == "split":
                rows.append(action("provA", sec=day * DAY, kind=kind,
                                   amount=None, currency=None,
                                   numerator=amt, denominator=1))
            else:
                rows.append(action("provA", sec=day * DAY, kind=kind,
                                   amount=float(amt)))
        if not rows:
            return
        df = make_actions(spark, rows)
        once = dedup_actions(df)
        got = once.collect()
        # canonical-key uniqueness (dedup_props.rs:44-60)
        keys = [
            (r.symbol, r.ts, r.kind, r.amount, r.currency, r.numerator,
             r.denominator)
            for r in got
        ]
        assert len(keys) == len(set(keys))
        assert set(keys) == {
            (r.symbol, r.ts, r.kind, r.amount, r.currency, r.numerator,
             r.denominator)
            for r in df.collect()
        }
        # idempotence
        assert sorted(map(str, dedup_actions(once).collect())) == sorted(
            map(str, got)
        )


gate_st = st.lists(st.integers(0, 20), min_size=1, max_size=20)


class TestGateProps:
    @SETTINGS
    @given(tss=gate_st)
    def test_gate_matches_sequential_replay(self, spark, tss):
        rows = [
            candle("provA", sec=t * 60, seq=i) for i, t in enumerate(tss)
        ]
        df = make_candles(spark, rows)
        kept = sorted(
            r.seq for r in monotonic_gate(df, key="symbol", order_col="seq").collect()
        )
        # sequential replay model (filters.rs:41-63)
        hwm = None
        want = []
        for i, t in enumerate(tss):
            if hwm is None or t >= hwm:
                want.append(i)
                hwm = t if hwm is None else max(hwm, t)
        assert kept == want


steps_st = st.lists(
    st.sampled_from([60, 60, 60, 300, 3600, 86_400]), min_size=1, max_size=10
)


class TestInferProps:
    @SETTINGS
    @given(steps=steps_st)
    def test_step_estimate_matches_model(self, spark, steps):
        secs = [0]
        for s in steps:
            secs.append(secs[-1] + s)
        rows = [candle("provA", sec=s, seq=i) for i, s in enumerate(secs)]
        df = make_candles(spark, rows)
        got = {r.symbol: r.step_seconds
               for r in estimate_step_seconds(df).collect()}
        # model (infer.rs:51-113): unique mode else lower median
        deltas = sorted(steps)
        counts = defaultdict(int)
        for d in steps:
            counts[d] += 1
        top = max(counts.values())
        modes = [d for d, n in counts.items() if n == top]
        if len(modes) == 1:
            want = modes[0]
        else:
            want = deltas[(len(deltas) + 1) // 2 - 1]  # lower median
        assert got == {"AAPL": want}


# ---------------------------------------------------------------------------
# Star-contraction connected components vs a pure-Python union-find model
# ---------------------------------------------------------------------------

edges_st = st.lists(
    st.tuples(st.integers(0, 24), st.integers(0, 24)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=0,
    max_size=40,
)


class TestStarContractionProps:
    @SETTINGS
    @given(edges=edges_st)
    def test_components_match_union_find(self, spark, edges):
        from borsa_spark.functions.dedup import dup_clusters

        n = 25
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {i: find(i) for i in range(n)}

        pairs = spark.createDataFrame(
            edges or [(0, 0)], "id_a long, id_b long"
        )
        if not edges:
            pairs = pairs.filter("id_a != id_a")  # empty frame, same schema
        nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
        got = {r.id: r.comp
               for r in dup_clusters(pairs, nodes, max_iters=30).collect()}
        assert got == want


# small random corpora over a tiny vocabulary: heavy shingle overlap, so
# containment/jaccard pairs actually occur
_vocab = ["alpha", "beta", "gamma", "delta", "echo", "foxtrot"]
docs_st = st.lists(
    st.lists(st.sampled_from(_vocab), min_size=3, max_size=10),
    min_size=2,
    max_size=8,
)


class TestContainmentProps:
    @SETTINGS
    @given(word_lists=docs_st)
    def test_matches_brute_force_model(self, spark, word_lists):
        """containment_pairs == the brute-force set model on every random
        corpus (df cap set high so nothing is excluded)."""
        from borsa_spark.functions.dedup import containment_pairs

        def sh3(words):
            return {" ".join(words[i:i + 3]) for i in range(len(words) - 2)}

        sets = {i: sh3(w) for i, w in enumerate(word_lists)}
        want = {}
        for a in sets:
            for b in sets:
                if a >= b or not sets[a] or not sets[b]:
                    continue
                inter = len(sets[a] & sets[b])
                cont = inter / min(len(sets[a]), len(sets[b]))
                if cont >= 0.9:
                    want[(a, b)] = (inter, len(sets[a]), len(sets[b]),
                                    round(cont, 4))

        docs = spark.createDataFrame(
            [(i, " ".join(w)) for i, w in enumerate(word_lists)],
            "doc_id long, text string",
        )
        got = {
            (r.id_a, r.id_b): (r.n_inter, r.n_a, r.n_b,
                               float(r.containment))
            for r in containment_pairs(
                docs, n=3, threshold=0.9, max_shingle_df=10_000
            ).collect()
        }
        assert got == want

    @SETTINGS
    @given(word_lists=docs_st)
    def test_prefix_recall_under_low_df_cap(self, spark, word_lists):
        """The PPJoin prefix must not lose recall when the df cap is LOW:
        the documented semantics are 'pair emitted iff containment >= t
        AND the pair shares at least one sub-cap shingle', and the
        pigeonhole argument (capped shingles sort df-ascending, ahead of
        common ones) must hold on arbitrary corpora, not just the high-cap
        regime the brute-force test exercises."""
        from borsa_spark.functions.dedup import containment_pairs

        def sh3(words):
            return {" ".join(words[i:i + 3]) for i in range(len(words) - 2)}

        cap = 3
        sets = {i: sh3(w) for i, w in enumerate(word_lists)}
        df_count: dict[str, int] = {}
        for s in sets.values():
            for g in s:
                df_count[g] = df_count.get(g, 0) + 1
        want = set()
        for a in sets:
            for b in sets:
                if a >= b or not sets[a] or not sets[b]:
                    continue
                shared = sets[a] & sets[b]
                cont = len(shared) / min(len(sets[a]), len(sets[b]))
                if cont >= 0.9 and any(df_count[g] <= cap for g in shared):
                    want.add((a, b))

        docs = spark.createDataFrame(
            [(i, " ".join(w)) for i, w in enumerate(word_lists)],
            "doc_id long, text string",
        )
        got = {
            (r.id_a, r.id_b)
            for r in containment_pairs(
                docs, n=3, threshold=0.9, max_shingle_df=cap
            ).collect()
        }
        assert got == want
