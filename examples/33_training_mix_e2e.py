"""33 — End-to-end training-mix materialization: a cleaned corpus to
deterministic, packed, sharded training batches (the c12 query's
composition — the corpus→batches half of the lifecycle next to
example 32's crawl→corpus half), plus the two-stage exact-substring
dedup (f93) that a production corpus-prep job runs where example 32
used whole-document dedup.

Stage chain, each from its own oracled operator:

    f77 logistic quality classifier (3 GD steps, hashed bigrams)
      -> median-prob gate (scale-invariant; broadcast scalar)
    f75 DSIR Gumbel-top-k (weighted sample without replacement,
      deterministic noise, compiles to TakeOrderedAndProject)
    f38 greedy sequence packing (256-token bins over 8 hash streams,
      one Arrow FlatMapGroupsInPandas)
    f54 seeded-shuffle training order + output shard

and, independently:

    f68 winnow screen -> f93 candidate-restricted exact spans
    (anchors built only for candidate docs; the pair gate replaces
    the corpus-wide df cap, so spans stay exact through boilerplate)

Run: python examples/33_training_mix_e2e.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from borsa_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from borsa_spark.queries import QUERIES, c12_stage_counts

    spark = get_spark("ex33_training_mix")

    # per-stage funnel — the gate must drop, DSIR must pick exactly k,
    # packing must keep every pick while genuinely binning
    counts = c12_stage_counts(spark, SF)
    print("training-mix funnel:")
    prev = None
    for stage in ("fixture", "survivors", "selected", "packed"):
        n = counts[stage]
        delta = "" if prev is None else f"  ({n - prev:+d})"
        print(f"  {stage:>10}: {n}{delta}")
        prev = n
    print(f"  packed into {counts['bins']} bins over "
          f"{counts['streams']} hash streams")

    # the materialized mix: deterministic position + shard per doc
    mix = QUERIES["c12_training_mix"](spark, SF)
    print("\nfirst training positions:")
    mix.orderBy("position").show(8)

    shard_sizes = mix.groupBy("shard").count().orderBy("shard")
    print("shard balance:")
    shard_sizes.show()

    # two-stage exact-substring dedup: winnow candidates gate the
    # exact span extractor — what Lee et al.'s dedup runs at scale
    spans = QUERIES["f93_candidate_substring_spans"](spark, SF)
    print("exact shared-substring spans (candidate-restricted):")
    spans.orderBy("id_a", "id_b", "start_a").show(8)
    spark.catalog.clearCache()


if __name__ == "__main__":
    main()
