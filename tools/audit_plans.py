"""Physical-plan audit: for each headline query, count the plan features
that matter at 100 TB — shuffles (Exchange), broadcast joins, sort-merge
joins, pushed filters, whole-stage codegen — and flag smells.

Usage: python tools/audit_plans.py [--sf DIR] [names...] [--md PLANS.md]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDIT = [
    "d01_parquet_scan", "d03_filter", "d06_keyed_dedup", "d07_inner_join",
    "d08_broadcast_join", "d12_star_join", "d13_theta_join", "d14_hash_agg_q1",
    "d20_limit_topk", "d21_topk_per_group", "d24_running_sum",
    "d37_sessionization", "d42_exact_dedup", "d43_minhash_lsh",
    "d44_cosine_topk", "d45_token_counts", "d50_pipeline_flagship",
    "x_asof_join", "x_ngram_jaccard", "x_embedding_neardup",
    "x_sequence_pack", "x_cosine_topk_np", "x_interval_join_bucketed",
    "x_skew_salted_join", "x_incremental_dedup",
    # round-3 additions
    "x_gopher_rules", "x_bpe_pretokenize", "x_duplicate_ngram_fraction",
    "x_bm25_score", "x_bloom_prefilter",
    "x_tpch_q3_shipping", "x_tpch_q5_local_supplier",
    # round-4/5 additions: the forced-SMJ fact-fact path and the
    # production-sized Bloom prefilter
    "x_tpch_q18_big_orders", "x_bloom_prefilter_prod",
    "x_tpch_q4_order_priority", "x_tpch_q7_volume_shipping",
    "x_tpch_q10_returned_items", "x_grouping_sets", "x_embedding_centroids",
    "x_tpch_q13_cust_distribution", "x_tpch_q22_sales_opportunity",
    "x_cohort_retention", "x_asof_join_tolerance",
    "x_tpch_q14_promo_revenue", "x_tpch_q15_top_supplier",
    "x_tpch_q17_small_qty_parts", "x_tpch_q19_disjunctive_join",
    "x_tpch_q8_market_share", "x_tpch_q21_waiting_supplier",
    "x_tpch_q6_forecast_revenue", "x_tpch_q12_priority_shipping",
    "x_tpch_q2_min_cost_supplier", "x_tpch_q11_important_stock",
    "x_tpch_q16_supplier_count", "x_tpch_q20_promo_suppliers",
    "x_yoy_growth", "x_time_weighted_avg",
    # round-6 additions: corpus rewrite, mixture design, layout
    "x_segment_dedup_scrub", "x_mixture_temperature",
    "x_doc_chunk_windows", "x_zorder_layout", "x_lm_surprisal_score",
    "x_mixture_resample", "x_pmi_collocations", "x_embedding_quantize",
    # round-6 continuation: SCD2/run-collapse, order statistics,
    # compaction planning, full-outer, graph analytics
    "x_scd2_intervals", "x_rolling_median", "x_compaction_plan",
    "x_full_outer_join", "x_triangle_count", "x_boilerplate_scrub",
    "x_countmin_sketch", "x_stratified_split", "x_dsir_resample",
    "x_hll_sketch_union", "x_skyline", "x_markov_transitions",
    "x_anomaly_zscore", "x_record_linkage", "x_hll_intersect",
    "x_inverted_index", "x_event_pattern_match",
    "x_last_click_attribution", "x_pandas_grouped_agg",
    "x_tpch_q9_product_profit", "x_column_profile",
    "x_partial_agg_merge", "x_dup_span_scrub", "x_cdc_apply",
    "x_interpolate", "x_phrase_search", "x_mad_outliers",
    "x_longest_streak", "x_session_paths", "x_market_basket",
    "x_rolling_dau", "x_table_diff", "x_temporal_join",
    "x_decile_bins", "x_ppjoin_setsim", "x_sorted_neighborhood",
    # round-7 additions: sampling, drift, entropy, audits, pHash dedup
    "x_priority_sample", "x_token_drift", "x_entropy_score",
    "x_benford", "x_skew_audit", "x_image_phash_neardup",
    "x_corpus_filter_pipeline", "x_dataset_card", "x_ccnet_buckets",
    # round-8 additions: retrieval fusion, training-set prep, exact
    # statistics, corpus audits, SQL/Arrow surfaces
    "x_rrf_fusion", "x_epoch_shuffle", "x_hard_negatives",
    "x_class_balance_resample", "x_winsorize", "x_cross_source_leakage",
    "x_matryoshka_eval", "x_spearman_corr", "x_ks_test",
    "x_gini_concentration", "x_dedup_threshold_sweep",
    "x_ngram_novelty_curve", "x_lateral_topk", "x_sql_udf",
    "x_groupby_all", "x_apply_in_arrow",
    # round-9 additions: the remaining SQL surfaces (r8 VERDICT #6),
    # then the eval/statistics batch (AUC, calibration, keyness;
    # x_transpose_stats excluded — transpose materializes its 5-row
    # input eagerly, so the audited df is a LocalRelation with no plan)
    "x_param_sql", "x_sql_variable",
    "x_auc_score", "x_calibration_bins", "x_keyness_tokens",
    # round-10 additions: the map-only eval-contamination report (the
    # whole point is its shape — no corpus-wide exchange) and the
    # winnowing fingerprint index (dup_ngram's shuffle pattern over a
    # ~3x smaller selected set)
    "x_eval_contamination", "x_winnowing_fingerprint",
    # round-15 additions: the text-index lifecycle pair — the gate must
    # stay 1 keyed shuffle (the batch-bounded postings build) with the
    # doc-ledger anti-join AQE-broadcast at this SF; the compactor is
    # the postings shuffle plus the distinct-agg expand at segment
    # grain (tiny rows), never a corpus-wide extra pass
    "x_incremental_index", "x_index_compaction",
    # and the read path: two term-pruned postings builds (base+delta),
    # tombstone anti-join + df/dl/stats joins AQE-broadcast at this SF,
    # global top-k as TakeOrderedAndProject — every exchange is
    # query-term-bounded, none is corpus-wide
    "x_index_overlay_search",
    # its vector twin: the serve side is broadcast-only (query set,
    # tombstones, admitted semi-join) + ONE qid window exchange; the
    # other exchanges are the in-line admission replay's gate cogroup
    # (probe/resident by cell) and disposition agg, which a production
    # deployment reads from the gate's output instead of recomputing
    "x_ann_overlay_search",
    # (x_dedup_report and x_tokenizer_fertility excluded with the other
    # iterative consumers: CC labels / BPE merge-loop lineage make the
    # one-shot exchange counts mis-state per-round work;
    # x_recursive_cte excluded for the same reason — the engine's
    # recursive-CTE loop repeats the frontier join per round)
    # x_neardup_survivors / x_dedup_clusters / x_bpe_train /
    # x_pagerank excluded:
    # their iterative loops accumulate per-round subtrees, so the
    # one-shot exchange/broadcast counts here mis-state per-round work
    # (which is one keyed shuffle; see the op docstrings)
]


def audit_one(name: str, df) -> dict:
    # Execute THIS df's own QueryExecution (collect, not a write clone):
    # a `.write` builds a separate execution, leaving this plan's
    # AdaptiveSparkPlan un-finalized (isFinalPlan=false) — the audit
    # would then read the INITIAL static plan and miss AQE's runtime
    # join promotions and stage reuse (found while verifying Q21's
    # ReusedExchange). Outputs at sf0.01 are bounded, so collect is safe.
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AdaptiveSparkPlan" not in plan or "isFinalPlan=true" in plan
    # the adaptive toString appends the pre-execution plan under an
    # "== Initial Plan ==" header — count only the final section
    plan = plan.split("== Initial Plan ==")[0]
    # a shared subtree prints once per consumer site but its exchanges
    # execute once: dedupe by plan_id, and skip ReusedExchange lines
    # (they quote the referenced exchange's description)
    ex_lines = [
        ln
        for ln in plan.splitlines()
        if re.search(r"(?<!Reused)Exchange (?:hash|range|Single)", ln)
        and "ReusedExchange" not in ln
    ]
    ex_ids = [re.search(r"\[plan_id=(\d+)\]", ln) for ln in ex_lines]
    n_exchanges = len({m.group(1) for m in ex_ids if m}) + sum(1 for m in ex_ids if m is None)
    return {
        "name": name,
        "exchanges": n_exchanges,
        "broadcasts": plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin"),
        "smj": plan.count("SortMergeJoin"),
        # codegen stages render as "*(n) Operator" prefixes in toString
        "codegen": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "pushed": "PushedFilters: [" in plan and not re.search(r"PushedFilters: \[\]", plan.split("PushedFilters", 1)[1][:2]),
        "top_k": "TakeOrderedAndProject" in plan,
        "plan": plan,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--md", default=None, help="write a markdown report to this path")
    ap.add_argument("--full", action="store_true", help="print full plans")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from chyme_spark.registry import load_all
    from chyme_spark.session import get_spark

    registry = load_all()
    spark = get_spark("audit_plans")
    names = args.names or [n for n in AUDIT if n in registry]

    rows = []
    for name in names:
        try:
            rows.append(audit_one(name, registry[name].fn(spark, args.sf)))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}")
    header = f"{'query':26s} {'xchg':>4} {'bcast':>5} {'smj':>4} {'wscg':>4}  notes"
    lines = [header, "-" * len(header)]
    for r in rows:
        notes = []
        if r["top_k"]:
            notes.append("TakeOrdered")
        if not r["pushed"] and r["name"].startswith(("d01", "d03")):
            notes.append("NO-PUSHDOWN!")
        if r["smj"] and r["broadcasts"] == 0 and r["name"] in ("d07_inner_join", "d08_broadcast_join"):
            notes.append("dim-join went SMJ!")
        lines.append(
            f"{r['name']:26s} {r['exchanges']:>4} {r['broadcasts']:>5} {r['smj']:>4} {r['codegen']:>4}  {' '.join(notes)}"
        )
    report = "\n".join(lines)
    print(report)
    if args.full:
        for r in rows:
            print(f"\n===== {r['name']} =====\n{r['plan']}")
    if args.md:
        with open(args.md, "w") as f:
            f.write(
                "# Physical plan audit\n\n"
                f"Generated by `python tools/audit_plans.py --sf {args.sf}`.\n\n"
                "Columns: shuffle exchanges / broadcast joins / sort-merge joins /\n"
                "whole-stage-codegen spans. Dimension joins must broadcast; scans\n"
                "must push filters; global top-k must compile to TakeOrderedAndProject.\n\n"
                "```\n" + report + "\n```\n"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
