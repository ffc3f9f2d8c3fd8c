#!/usr/bin/env python3
"""Emit the OPTIMIZATION_r18 per-query checklist table (markdown).

Merges BENCH_FULL.json (final quiet-box record), DUCKDB_BASELINE.json,
and the per-row adjudications below into one table: every catalog row
with its measured time, oracle ratio, and what this optimization round
did with it. Usage: python3 tools/opt_checklist.py >> OPTIMIZATION_r18.md
"""
import json
import sys

bench = json.load(open("BENCH_FULL.json"))
oracle = json.load(open("DUCKDB_BASELINE.json")).get("queries", {})
iso = bench.get("isolated", {})

# Rows changed this round (r18), with the change and evidence.
CHANGED = {
    "q_pagerank": "per-iteration 1-row crossJoin(broadcast(count)) -> driver-scalar literal (BNLJ 10->0 in the cut plan, plans/r18); warm probe 1.15->0.89 s; AQE leg A/B-rejected (1.25-1.29 vs 0.99-1.14 s)",
    "q_tfidf_sim": "broadcast additionally gated on ACTUAL pair count (ADVICE r17 medium); plan at bench sf unchanged; skew_shj_r18 wave x1-x100: gate flips bhj 3->0 / shj 1->4 at x10, ~linear per decade; probe 0.88-0.94 s settles the driver's 1.47 s reading as contention",
}

# r17 rewrites re-validated (not re-touched) this round: the six
# SHUFFLE_HASH families got a fresh adversarial x50/x100 wave
# (skew_shj_r18; SCALE.md) — zero spill/OOM, growth in the envelope.
R17_STANDS = {
    "q_fm_summarize": "r17 stack-pivot rewrite stands (0 Expand, 0 data sorts)",
    "q_fm_win_exclude": "r17 total-minus-cumulative COUNT suffixes stand",
    "q_fm_win_exclude_minmax": "r17 inverted-order running extreme stands",
    "q_dedup_minhash": "r17 band-join SHUFFLE_HASH stands; re-validated x50/x100 adversarial (top step 2.8x, gated broadcasts degrade to SMJ by design)",
    "q_dedup_incremental": "r17 hash-builds stand; re-validated x50/x100 (top step 1.5x, shj stable)",
    "q_semdedup": "r17 salted-block hash-builds stand; re-validated x50/x100 (top step 2.4x)",
    "q_knn_graph": "r17 top-k hash-build stands; re-validated x50/x100 (top step 2.1x, gated broadcast degrades to SMJ)",
    "q_ann_lsh_recall": "r17 bounded broadcast stands (8 queries x k rows by construction)",
    "q_embed_neardup": "r17 band/embedding hash-builds stand; re-validated x50/x100 (top step 1.5x)",
    "q_multimodal_phash": "r17 gated bucket-join hint stands (broadcast under gate at bench sf)",
}

# Rows examined in depth and deliberately left, with why.
LEFT = {
    "q_jaccard_prefix": "collapse-first prefix-filter plan, 0 SMJ; r18: residency tax EXONERATED on a quiet box (0.862 catalog vs 0.896 isolated; whole-run GC 4.65 s STW / zero Full GCs) — the r17 1.8 s driver reading was box contention",
    "q_winnow_crossdup": "collapse-first, df-pruned, hb-gated; cost = codegen winnow kernel + bounded joins; high run-spread is GC noise",
    "q_fm_mutations": "driver file rewrite + mtime invalidation IS the reference contract",
    "q_fm_mutations_dist": "distributed rewrite path; same contract",
    "q_fm_win_exclude_range": "a_cur's DECLARED frame (RANGE CR..UF) is the quadratic one; r18 WindowFrameProbe: O(rows) alternatives are up to 1200x faster AND move the last ulp on ~98% of rows — the parity the fuzz pins; floor, now with numbers",
    "q_session_funnel": "4 sequential stage gates are the funnel definition; co-partitioned on user_id throughout",
    "q_cohort_retention": "distinct + join + count-distinct, co-partitioned on user_id; floor",
    "q_range_join": "bucketed grid equi-join; SMJ kept for spill robustness under skewed time buckets (generic operator)",
    "q_cdc_merge": "full-outer merge join, both sides keyed; SMJ is the robustness guarantee (PLANS.md adjudication)",
    "q_salted_agg": "explicit two-phase salted shape is the point of the row",
    "q_pack_sequences": "distributed 2-pass prefix sum (anti-single-partition-window shape)",
    "q_token_budget_select": "floor note current (2-pass prefix sum + budget broadcast); PLANS.md band 2.2-2.6x shrinking with scale",
    "q_boilerplate": "floor note current (train-then-score 2-job boundary, candidate fold measured-and-rejected)",
    "q_lm_bigram": "floor note current (global c1/V before any score = inherent second job)",
    "q_bpe_doclen": "r16 broadcast fold-table fix stands; scheduling floor band",
    "q_dpo_pairs": "floor note current (one shared (source,band) shuffle + two windows is minimal)",
    "q_para_dedup": "r17 floor note with measured crossover: parity at x100, Spark leads 1.3x at x1000",
    "q_quality_repetition": "r17 floor note with measured crossover: parity at x100, Spark leads 2.2x at x1000",
}

STRATEGY = {
    "q_stream_sessionize_chunked": "hot-key strategy variant (wins the x50 wave); weak at sf0.1 BY DESIGN",
    "q_stream_sessionize_auto": "selector row: chosen branch + one bounded skew diagnostic",
    "q_stream_dedup_agg": "hot-key strategy variant (partial-below-exchange aggregate)",
    "q_asof_join_chunked": "hot-key strategy variant (chunked stitch, wave-flat x1-x50)",
}

FAMS = [
    ("q_fm_", "fm dialect row over the cached serving frame (parse layout kept: the r17 coalesce experiment was measured as a regression and reverted); engine path re-audited, no SMJ"),
    ("q_ann_", "ANN family: bounded collects (seeds/codebooks/8 query rows), recall floors pinned, r17-pre family-wide shared IVF index"),
    ("q_embed_", "embedding family: codegen kernels, posexplode aggregates; plan audited"),
    ("q_dedup_", "dedup family: collapse-first, cutoff-bounded candidates, hb-gated joins"),
    ("q_stream_", "streaming family: selector-closed in the r17-interrupted session; wave-measured"),
    ("q_multimodal_", "multimodal family: banded phash over distinct hashes, batched mapPartitions decode stub"),
    ("q_graph_", "graph family: degree-oriented wedges / kcore peeling, shuffle_hash everywhere, supernode-measured"),
    ("q_sketch_", "bounded-sketch aggregates (KMV/HLL/CMS/theta): single aggregate pass"),
    ("q_text_", "text family: codegen expressions over shared persisted word/shingle frames"),
    ("q_quality_", "quality family: shared scored frame, broadcast joins"),
    ("q_bpe_", "BPE family: vocabulary-sized folds, broadcast fold tables"),
    ("q_multimodal", ""),
]
DEFAULT = "tail row at the per-job scheduling floor (<~0.4 s); plan audited (PLANS.md), no SMJ/cartesian/unpushed filter; left alone"


def note(name):
    if name in CHANGED:
        return "CHANGED: " + CHANGED[name]
    if name in R17_STANDS:
        return "left: " + R17_STANDS[name]
    if name in STRATEGY:
        return "left: " + STRATEGY[name]
    if name in LEFT:
        return "left: " + LEFT[name]
    for p, n in FAMS:
        if name.startswith(p) and n:
            return "left: " + n
    return "left: " + DEFAULT


print("\n## Per-query checklist (full catalog, final quiet-box record)\n")
print(f"Record: total {bench['value']} s / {bench['n_queries']} queries, "
      f"noise floor {bench['noise_floor_sec']} s, "
      f"weak>2x {list(bench.get('weak_over_2x', {}))}, "
      f"strategy-variant weak {list(bench.get('weak_strategy_variants', {}))}.\n")
print("| query | bench s | iso s | oracle s | ratio | adjudication |")
print("|---|---|---|---|---|---|")
for name in sorted(bench["queries"]):
    v = bench["queries"][name]
    o = oracle.get(name)
    i = iso.get(name)
    best = min(v, i) if i else v
    # the weak rule applies only where the oracle is >= 0.1 s: below
    # that, both engines sit on their per-query floors (DuckDB's
    # single-process ms vs Spark's ~0.1-0.3 s job floor) and the ratio
    # measures scheduling constants, not the query
    if not o or o <= 0:
        ratio = "-"
    elif o < 0.1:
        ratio = "(sub-floor oracle)"
    else:
        ratio = f"{best / o:.2f}"
    print(f"| {name} | {v:.3f} | {f'{i:.3f}' if i else ''} | "
          f"{f'{o:.3f}' if o else '-'} | {ratio} | {note(name)} |")
