#!/usr/bin/env python3
"""Regenerate the SCALECURVE.md ratio table from two bench records.

Usage: python3 tools/scalecurve.py bench_sf001.json bench_sf01.json

Prints the markdown table (ratio-descending) plus the totals line; the
prose header of SCALECURVE.md is maintained by hand. Pair-producing
operators (the superlinear-risk set) are starred.
"""
import json
import sys

PAIR_PRODUCING = {
    "q_ngram_jaccard", "q_ngram_jaccard_exact", "q_minhash_lsh",
    "q_simhash_pairs", "q_embed_dup", "q_embed_dup_lsh", "q_semdedup",
    "q_contamination", "q_contamination_fuzzy", "q_contamination_bloom",
    "q_dedup_incremental", "q_dedup_incremental_capped",
    "q_dup_clusters", "q_dup_spans", "q_segment_dedup",
    "q_sorted_neighborhood", "q_weighted_jaccard", "q_prefix_filter",
    "q_qgram_edit", "q_triangles", "q_interval",
    "q_winnow_pairs", "q_winnow_clusters", "q_linkage", "q_theil_sen",
    "q_dup_consensus",
    "q_link_pred", "q_itemsets",
}


def main() -> int:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    for rec, name in ((small, sys.argv[1]), (big, sys.argv[2])):
        if rec.get("contended"):
            print(f"refusing: {name} is marked contended", file=sys.stderr)
            return 1
    qs, qb = small["queries"], big["queries"]
    common = sorted(set(qs) & set(qb), key=lambda q: -(qb[q] / max(qs[q], 1e-9)))
    only = sorted(set(qs) ^ set(qb))
    if only:
        print(f"(queries in only one record, omitted: {only})", file=sys.stderr)
    ts, tb = sum(qs[q] for q in common), sum(qb[q] for q in common)
    print(f"Totals: sf0.01 {ts:.1f}s -> sf0.1 {tb:.1f}s "
          f"({tb / ts:.2f}x for 10x data).\n")
    print("| query | sf0.01 (s) | sf0.1 (s) | ratio |\n|---|---|---|---|")
    worst = 0.0
    for q in common:
        r = qb[q] / max(qs[q], 1e-9)
        worst = max(worst, r)
        star = " \\*" if q in PAIR_PRODUCING else ""
        print(f"| {q}{star} | {qs[q]:.2f} | {qb[q]:.2f} | {r:.1f}x |")
    print(f"\nworst ratio: {worst:.1f}x "
          f"(canaries {small.get('canary_sec')}s / {big.get('canary_sec')}s)",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
