"""The bench stdout contract (round 14): the ONE printed JSON line must
carry per-query walls (the driver computes its per-query speedup table,
geomean, and core-count scaling from the parsed line — PERF_r13 came
back empty because the r13 line held totals only) AND must never exceed
the driver's ~2000-char stdout tail capture, or the driver parses
nothing at all (the r8/r9 failure mode)."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench


def _fake(n_tier2: int = 39, scale: float = 1.0) -> tuple[dict, dict, int, int]:
    walls1 = {name: (0.3 + 0.1 * i) * scale
              for i, name in enumerate(bench.HEADLINE)}
    walls1["t1_stream_gate_candles"] = 2.0 * scale
    walls1["t1_stream_gate_candles_rocksdb"] = 2.5 * scale
    walls2 = {name: (1.0 + 0.2 * i) * scale
              for i, name in enumerate(bench.TIER2[:n_tier2])}
    full = {
        "metric": "headline_queries_total",
        "value": round(sum(walls1.values()), 3),
        "tier2_total": round(sum(walls2.values()), 3),
        "probe_s": 1.234,
        "probe_arrow_s": 0.987,
        "sf": 0.1,
    }
    return full, {**walls1, **walls2}, len(walls1), len(walls2)


class TestBenchStdoutLine:
    def test_line_carries_every_query_and_fits_tail(self):
        full, walls, n1, n2 = _fake()
        line = bench.format_stdout_line(full, walls, n1, n2)
        assert len(line) <= 1990
        d = json.loads(line)
        # the driver contract fields
        assert d["metric"] == "headline_queries_total"
        assert d["unit"] == "sec"
        assert d["sf"] == 0.1
        # EVERY benched query present, tier split recoverable
        assert set(d["queries"]) == set(walls)
        assert d["n_queries"] == n1 and d["n_tier2"] == n2
        assert list(d["queries"])[:n1] == list(walls)[:n1]

    def test_walls_round_trip_within_encoding_tolerance(self):
        full, walls, n1, n2 = _fake()
        d = json.loads(bench.format_stdout_line(full, walls, n1, n2))
        for k, v in walls.items():
            enc = d["queries"][k]
            tol = 0.5 if v >= 10 else (0.05 if v >= 2 else 0.005)
            assert abs(enc - v) <= tol + 1e-9, (k, v, enc)

    def test_loaded_host_line_still_fits(self):
        # a 10x load burst stretches every wall's digits
        full, walls, n1, n2 = _fake(scale=10.0)
        line = bench.format_stdout_line(full, walls, n1, n2)
        assert len(line) <= 1990
        assert set(json.loads(line)["queries"]) == set(walls)

    def test_degrade_drops_tier2_from_the_end_and_says_so(self):
        full, walls, n1, n2 = _fake()
        line = bench.format_stdout_line(full, walls, n1, n2, budget=1200)
        assert len(line) <= 1200
        d = json.loads(line)
        omitted = d["queries_omitted"]
        assert omitted > 0
        # headline walls survive; only trailing tier-2 entries drop
        kept = list(d["queries"])
        assert kept == list(walls)[: len(walls) - omitted]
        assert set(list(walls)[:n1]) <= set(kept)
