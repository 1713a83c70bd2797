#!/usr/bin/env python3
"""Duplicated-scan census over PLANS.md (VERDICT r17 #10).

Round 17 ran this sweep as a one-off and it found the real duplicated
towers (NBC profile, tfidf/bm25 double tokenize, ann_lsh bucket tower).
This is the committed form: parse the regenerated PLANS.md, count
`FileScan parquet` nodes per (query, table), and report every query
scanning one table more than once — minus the DEFINITIONAL allowlist
(multi-table TPC-H joins scan each table once; self-joins, train/eval
splits and query-vs-corpus sides legitimately scan a table twice+).

The table behind a FileScan is recovered from its projected column
names (the dump elides paths): each fixture table owns a distinct
column-prefix vocabulary.

Usage: python3 tools/scan_census.py [PLANS.md]
Exit 0 always (audit aid, not a gate); prints the census and a
NEW-vs-allowlist verdict per flagged query.
"""
import re
import sys
from collections import defaultdict

# Leading projected column -> fixture table. First match wins; the
# dump's FileScan lines begin with the projected column list.
COLUMN_TABLE = [
    (re.compile(r"\bl_"), "lineitem"),
    (re.compile(r"\bo_"), "orders"),
    (re.compile(r"\bc_"), "customer"),
    (re.compile(r"\bps_"), "partsupp"),
    (re.compile(r"\bp_"), "part"),
    (re.compile(r"\bs_"), "supplier"),
    (re.compile(r"\bn_"), "nation"),
    (re.compile(r"\br_"), "region"),
    (re.compile(r"\b(doc_id|text|lang|source|quality)"), "documents"),
    (re.compile(r"\b(vec_id|embedding|label)"), "embeddings"),
    (re.compile(r"\b(event_id|user_id|event_type|ts|amount)"), "events"),
]

# Queries whose multi-scan of one table is the OPERATOR'S DEFINITION,
# adjudicated in OPTIMIZATION_r17.md / VERDICT r17 (query -> reason).
ALLOWLIST = {
    # TPC-H self-joins / correlated subqueries over the same table
    "q2_min_cost_supplier": "correlated min-cost subquery re-scans partsupp",
    "q11_important_stock": "global-threshold subquery re-scans partsupp",
    "q15_top_supplier": "max-revenue subquery re-scans the revenue CTE's lineitem",
    "q16_supplier_variety": "NOT IN supplier subquery + partsupp main",
    "q17_small_quantity": "per-part avg subquery re-scans lineitem",
    "q18_large_orders": "having-sum subquery re-scans lineitem",
    "q20_excess_stock": "half-of-shipped subquery re-scans lineitem",
    "q21_waiting_orders": "l2/l3 exists/not-exists re-scan lineitem (2-level agg form keeps 2)",
    "q22_dormant_customers": "avg-balance scalar subquery re-scans customer",
    "q7_volume_shipping": "nation scanned for both endpoints",
    "q8_market_share": "nation scanned for cust + supp sides",
    "q5_local_supplier": "cust and supp nation legs",
    "q9_product_profit": "multi-table star, one scan each",
    # train/eval, query-vs-corpus, batch-vs-index splits
    "llm_nbc_confusion": "train split (pinned prof) + holdout eval scan",
    "llm_nbc_calibration": "train split (pinned) + holdout eval scan",
    "llm_nbc_roc": "train split (pinned) + holdout eval scan",
    "llm_nbc_profile": "train-only single scan (listed defensively)",
    "llm_ann_cosine_topk": "query side + corpus side",
    "llm_ann_lsh": "exact re-rank + ground-truth sides (post-pin residual)",
    "llm_ann_ivf": "query side + corpus side share one cell scan",
    "llm_ann_ivf_mp": "query side + corpus side",
    "llm_ann_annotate_mp": "query side + corpus side",
    "llm_mrl_recall": "full-dim ground truth vs truncated-dim sides",
    "llm_hard_negatives": "positive pairs + negative pool sides",
    "llm_contamination": "train corpus vs eval benchmark sides",
    "llm_contamination_ratio": "train corpus vs eval benchmark sides",
    "llm_dedup_incremental": "batch vs already-indexed sides",
    "llm_dedup_bloom_inc": "batch vs indexed sides",
    "llm_snapshot_diff": "old vs new snapshot sides",
    "llm_e2e_curation": "stage pins re-read documents per stage entry",
    "llm_longest_dup_substring": "index build (memoized) + text join-back",
    "llm_longest_dup_unicode": "index build (memoized) + text join-back",
    "llm_suffix_array": "memoized index + per-doc rank scan",
    "llm_substring_excise": "span frame + excise join-back",
    "llm_substring_spans": "memoized span frame consumers",
    "audit_integrity": "cross-table referential checks, one scan each",
    "quality_expectations": "per-expectation independent predicates",
    "merge_upsert": "base vs updates sides",
    "scd2_history": "current vs incoming sides",
    "set_except": "left vs right sides",
    "set_except_all": "left vs right sides",
    "set_intersect": "left vs right sides",
    "set_intersect_all": "left vs right sides",
    "set_union": "left vs right sides",
    "llm_dedup_exact": "survivor join-back re-reads documents",
    "llm_dedup_survivors": "survivor join-back",
    "llm_para_dedup": "paragraph explode + survivor join-back",
    "llm_diversify_topk": "score pass + diversity re-rank pass",
    "llm_domain_divergence": "per-domain vs global distribution sides",
    "llm_dsir_weights": "target vs proposal distribution sides",
    "llm_curation_funnel": "per-stage counts re-scan documents",
    "llm_dataset_card": "multi-section census over documents",
    "fuzzy_name_match": "left vs right fuzzy sides",
    "join_bloom_prefilter": "bloom build + exact semi-join re-scan",
    "layout_dpp_prune": "partitioned write then pruned re-read",
    "llm_winnow_pairs": "winnow fingerprints both join sides (memoized)",
    # r18 adjudications (this round's census sweep)
    "agg_approx_top_k": "exact top-3 baseline vs raw-stream sketch — the sketch definitionally consumes raw rows",
    "agg_hll_mergeable": "per-group sketches vs exact global distinct — the verification IS the gate",
    "join_null_safe": "null-safe self-join sides",
    "join_theta_range": "band histogram + own-band equi side over part (the decomposition's two legs)",
    "llm_dedup_editdist": "blocked candidate-pair self-join sides",
    "llm_lang_id": "2-column label scan + tokenize/prediction side",
    "llm_sq8_train": "quantizer range pass + encode pass (training two-pass; PQ r17 precedent)",
    "llm_sq8_topk": "encode pass + exact-double query side",
    "llm_bq_topk": "binarize pass + exact-double query side",
    "llm_ivf_add": "existing index vs added batch sides",
    "ts_anomaly": "baseline statistics vs scored activity sides",
    "ts_gapfill": "calendar spine bounds vs data sides",
    "ts_retention": "cohort vs later-activity sides",
    "sort_nulls_order": "two null-ordering legs over one projection — the gate witnesses both",
    "llm_rrf_fusion": "lexical (bm25) vs quality ranking sides — two independent signals",
    # r18 conditional-pin rewrites: ONE pass above spark.graft.pin.minBytes;
    # a sub-threshold plan capture re-derives the counts tower per consumer
    "llm_bigram_lm": "single tokenize pass above the conditional-pin threshold (c1 = row-sum of pinned c2)",
    "llm_oov_rate": "single tokenize pass above the threshold (vocab + rate from pinned (source,w) counts)",
    "llm_vocab_coverage": "single tokenize pass above the threshold (total = sum of pinned counts)",
    "agg_heavy_hitters": "2 passes above the threshold (pinned counts frame); sub-threshold capture re-expands",
    "agg_freq_items": "2 passes above the threshold (pinned counts frame); sub-threshold capture re-expands",
    "llm_tfidf": "1 tokenize pass above the threshold (df from pinned tf); sub-threshold capture re-expands",
    "llm_bm25": "1 tokenize pass above the threshold (df from pinned tf); sub-threshold capture re-expands",
    "sql_not_in_null": "NOT IN vs NOT EXISTS subqueries — the comparison IS the gate",
    "llm_rp_topk": "query vs corpus sides of the conditionally-pinned projection; sub-threshold capture re-expands",
}


def main(path: str) -> int:
    text = open(path, encoding="utf-8").read()
    sections = re.split(r"^## ", text, flags=re.M)[1:]
    flagged = []
    for sec in sections:
        name, _, body = sec.partition("\n")
        name = name.strip()
        scans = re.findall(r"FileScan parquet \[([^\]]*)\]", body)
        per_table = defaultdict(int)
        for cols in scans:
            bare = re.sub(r"#(?:\d+|x)L?", "", cols)
            table = next(
                (t for rx, t in COLUMN_TABLE if rx.search(bare)), "unknown")
            per_table[table] += 1
        dups = {t: c for t, c in per_table.items() if c >= 2}
        if dups:
            flagged.append((name, dups))
    print(f"queries with a table scanned >=2x: {len(flagged)}")
    new = []
    for name, dups in sorted(flagged):
        tag = ALLOWLIST.get(name)
        mark = f"definitional: {tag}" if tag else "NEW — investigate"
        if not tag:
            new.append(name)
        detail = ", ".join(f"{t}x{c}" for t, c in sorted(dups.items()))
        print(f"  {name}: {detail} [{mark}]")
    print(f"\nnew (not allowlisted): {len(new)}")
    for n in new:
        print(f"  {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "PLANS.md"))
