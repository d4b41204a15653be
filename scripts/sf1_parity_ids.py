"""Stratified ~50-id sample for the sf1-equivalent parity run
(r9 verdict #7): every builder module represented via round-robin over
registration order, with the five r9 oracle flips, the r10 banding
knob, and the flagship force-included. Prints one id per line so the
list can be passed straight to driver_sim.py.

Usage:
  python scripts/sf1_parity_ids.py [n]
  python driver_sim.py --sf <sf1_equiv_dir> $(python scripts/sf1_parity_ids.py)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from flink_realtime_2024_spark.plans.registry import all_queries  # noqa: E402

FORCED = [
    "flagship_revenue_by_nation",
    # the five r9 reverify flips — each must carry sf1-equivalent evidence
    "llm_dedup_minhash",
    "llm_dedup_simhash",
    "llm_knn_int8",
    "mm_resize_stats",
    "mm_decode_stats",
    # the r10 banding knob
    "llm_dedup_simhash_b5",
]


def stratified(n: int = 50) -> list[str]:
    qs = all_queries()
    by_module: dict[str, list[str]] = {}
    for name, q in qs.items():  # registration order
        by_module.setdefault(q.builder.__module__, []).append(name)
    picked = [f for f in FORCED if f in qs]
    seen = set(picked)
    # round-robin across modules so every family lands before any
    # family gets a fourth pick
    idx = 0
    while len(picked) < n:
        progressed = False
        for mod in sorted(by_module):
            names = by_module[mod]
            if idx < len(names):
                cand = names[idx]
                if cand not in seen:
                    picked.append(cand)
                    seen.add(cand)
                    progressed = True
                    if len(picked) >= n:
                        break
        idx += 1
        if not progressed and idx > max(len(v) for v in by_module.values()):
            break
    return picked


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    print("\n".join(stratified(n)))
