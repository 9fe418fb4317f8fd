"""Fold N full bench_out.json runs into one canonical artifact
(elementwise min per query — the shared host's min-of-N rule; see
BASELINE.md). Probes keep the minimum too (ratios stay conservative);
per-run probes and totals are recorded so the host window is auditable.

Usage: python tools/fold_bench_runs.py out.json run1.json run2.json [...]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out_path, *runs = sys.argv[1:]
    datas = []
    for p in runs:
        with open(p) as f:
            datas.append(json.load(f))
    base = dict(datas[0])
    for field in ("queries", "tier2_queries"):
        names = set()
        for d in datas:
            names |= set(d[field])
        base[field] = {
            n: round(min(d[field][n] for d in datas if n in d[field]), 3)
            for n in sorted(names)
        }
    base["value"] = round(sum(base["queries"].values()), 3)
    base["tier2_total"] = round(sum(base["tier2_queries"].values()), 3)
    base["probe_s"] = min(d["probe_s"] for d in datas)
    base["probe_arrow_s"] = min(d["probe_arrow_s"] for d in datas)
    base["probe_blend_s"] = round(
        (base["probe_s"] + base["probe_arrow_s"]) / 2, 3
    )
    for rfield, probe in (
        ("ratios", "probe_s"),
        ("ratios_arrow", "probe_arrow_s"),
        ("ratios_blend", "probe_blend_s"),
    ):
        if rfield in base:
            allq = dict(base["queries"])
            allq.update(base["tier2_queries"])
            base[rfield] = {
                n: round(w / base[probe], 2) for n, w in allq.items()
            }
    if "ratios" in base:
        base["total_ratio"] = round(
            sum(base["ratios"][n] for n in base["queries"]), 2
        )
    if "ratios_blend" in base:
        base["total_ratio_blend"] = round(
            sum(base["ratios_blend"][n] for n in base["queries"]), 2
        )
    base["elementwise_min_of_runs"] = len(datas)
    base["per_run_probes"] = [
        {
            "probe_s": d["probe_s"],
            "probe_arrow_s": d["probe_arrow_s"],
            "headline_total": d["value"],
            "tier2_total": d["tier2_total"],
        }
        for d in datas
    ]
    with open(out_path, "w") as f:
        json.dump(base, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"folded {len(datas)} runs -> {out_path}: "
        f"headline {base['value']}, tier2 {base['tier2_total']}, "
        f"probe {base['probe_s']}/{base['probe_arrow_s']}"
    )


if __name__ == "__main__":
    main()
