"""Fold N scale_evidence runs into SCALE_EVIDENCE_local.json (min-of-N).

Timing rows keep the minimum `sec` across runs (the machine is shared;
min approximates the unloaded cost of the CURRENT code — only fold runs
taken on the same code). Non-timing accounting fields (rows, bucket
counts) must agree across runs and are carried through.

Usage: python tools/fold_scale_runs.py out.json run1.json run2.json [...]
"""

from __future__ import annotations

import json
import sys


def key(rec: dict) -> tuple:
    return (rec["query"], rec["sf"])


def main() -> None:
    out_path, *runs = sys.argv[1:]
    folded: dict[tuple, dict] = {}
    n_runs = len(runs)
    for path in runs:
        with open(path) as f:
            for rec in json.load(f):
                k = key(rec)
                if k not in folded:
                    folded[k] = dict(rec)
                    continue
                prev = folded[k]
                for fld, val in rec.items():
                    if fld == "sec":
                        prev["sec"] = min(prev["sec"], val)
                    elif prev.get(fld) != val:
                        raise SystemExit(
                            f"{k}: non-timing field {fld!r} disagrees "
                            f"({prev.get(fld)!r} vs {val!r}) — runs are "
                            "not from the same code/data"
                        )
    results = []
    for rec in folded.values():
        rec["samples"] = f"min-of-{n_runs}"
        results.append(rec)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    for rec in results:
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
