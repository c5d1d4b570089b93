"""Headline benchmark: runs the flagship queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is fully materialized via the noop sink (no driver
collect; measures the whole plan incl. shuffle/exchange).
"""

from __future__ import annotations

import json
import re
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from py_etl_pipeline_woocommerce_spark.session import get_spark

HEADLINE = [
    "apply_refunds_orders",
    "kpis",
    "pricing_summary",
    "top_products",
    "geo_rollup",
    "regional_revenue",
    "top_orders_per_customer",
    "dedup_exact",
    "dedup_minhash",
    "dedup_clusters",
    "embedding_cosine_dup",
    "ann_topk",
    "quality_score",
    "product_profit",
    "tfidf_top_terms",
    "label_centroids",
    "stratified_sample",
    "sample_exact_k",
    "hopping_window_agg",
    "event_window_agg",
    "sessionize",
    "asof_join",
    "asof_join_nearest",
    "range_join_window",
    "multires_rollup",
    "repetition_stats",
    "pack_sequences",
    "quantize_embeddings",
    "filter_pipeline",
    "doc_rarity",
    "dedup_incremental_near",
    "ohlc_bars",
    "value_histogram",
    "customer_order_gaps",
    "chunk_documents",
    "vocab_drift",
    "ann_quantized_topk",
    "scd2_apply",
    "snapshot_diff",
    "corpus_prep",
    "dedup_containment",
    "unigram_logprob",
    "tokenizer_stats",
    "session_window_agg",
    "dau_sketch_rollup",
    "dsir_weights",
    "repeated_spans",
    "strip_common_lines",
    "normalize_text",
    "gopher_rules",
    "bigram_logprob",
    "source_divergence",
    "seasonal_profile",
    "pca_project",
    "lang_confusion",
    "value_outliers_mad",
    "perplexity_bucket_mix",
    "pmi_terms",
    "mmr_topk",
    "corpus_report",
    "pack_bins_bfd",
    "lang_id_nb",
    "ewma_daily",
    "hash_embed",
    "conversion_latency",
    "quality_percentile_by_source",
    "doc_similarity_topk",
    "cluster_stats",
    "profile_orders",
    "session_paths",
    "dup_cluster_histogram",
    "dedup_audit",
    "daily_value_percentiles",
    "equidepth_histogram",
    "seasonal_anomaly",
    "event_transitions",
    "user_overlap",
    "bm25_search",
    "rfm_segments",
    "rollup_merge",
    "hot_keys",
    "hybrid_search",
    "basket_pairs",
    "time_gaps",
    "merge_intervals",
    "m4_downsample",
    "ks_drift",
    "cdc_apply",
    "numeric_corr",
    "dayn_retention",
    "part_pagerank",
    "split_leakage",
    "cusum_changepoint",
    "trend_fit",
    "linear_attribution",
    "hot_keys_approx",
    "fulfillment_latency",
    "wow_growth",
    "session_stats",
    "repeat_rate",
    "user_streaks",
    "dau_new_vs_returning",
    "split_leakage_near",
    "interarrival_stats",
    "strip_markup",
    "extract_links",
    "weighted_sample_k",
    "common_lines",
    "readability",
    "char_entropy",
    "link_domains",
    "filter_blocked_domains",
    "zipf_fit",
    "ngram_novelty",
    "curriculum_order",
    "embedding_outliers",
    "mojibake_score",
    "fix_mojibake",
    "split_sentences",
    "bpe_merge_candidates",
    "anchor_texts",
    "skipgram_pairs",
    "bpe_merge_table",
    "bpe_token_count",
    "bpe_segment_vocab",
]


def calibration(spark, passes: int = 3) -> float:
    """Fixed-cost contention sentinel: a constant 2x10^8-row range sum
    (pure whole-stage-codegen arithmetic, no IO, no data dependence).
    Its wall-time depends only on how much CPU this box is actually
    giving us, so a reading well above its BASELINE.md value marks the
    whole bench run as contended — round 3's driver bench read 1.61x
    baseline purely from box load and nearly failed the 2x gate on
    noise. Median of `passes` samples, after one warm pass."""
    q = lambda: (  # noqa: E731
        spark.range(0, 200_000_000, 1, 32)
        .selectExpr("sum(id * 3 + 7) AS s")
        .write.mode("overwrite")
        .format("noop")
        .save()
    )
    q()
    samples = []
    for _ in range(passes):
        t0 = time.time()
        q()
        samples.append(time.time() - t0)
    samples.sort()
    return round(samples[len(samples) // 2], 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # non-greedy digits + optional fraction: the old [0-9.]+ captured
    # a trailing dot from names like sf0.1.bak and float() crashed —
    # defeating the "unknown layout, still run" fallback
    m = re.search(
        r"sf([0-9]+(?:\.[0-9]+)?)", os.path.basename(sf_dir.rstrip("/"))
    )
    sf = float(m.group(1)) if m else 0.0  # 0.0 = unknown layout, still run
    spark = get_spark("bench")
    qs = entrymod.queries()

    # warm the JVM + parquet footers with one cheap pass
    qs["date_bounds"](spark, sf_dir).count()

    calibration_sec = calibration(spark)

    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
    times: dict[str, float] = {}
    for name in HEADLINE:
        # Warmup pass amortizes one-time codegen/JIT of the query's
        # expression tree (a fixed driver cost, irrelevant at scale);
        # the cache is cleared so persisted intermediates from the
        # warmup don't flatter the timed passes — each measures the
        # full recompute with warm JIT. The MEDIAN of the timed passes
        # is recorded: this box drifts 2-10x run-to-run, and a single
        # sample eats the whole 2x regression budget in noise.
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        samples = []
        for _ in range(passes):
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(time.time() - t0)
            spark.catalog.clearCache()
        samples.sort()
        times[name] = round(samples[len(samples) // 2], 3)

    total = round(sum(times.values()), 3)
    payload = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": times,
            "sf": sf,
            "passes": passes,
            "calibration_sec": calibration_sec,
        }
    )
    print(payload)
    # The driver captures only a stdout TAIL, which truncated the first
    # ~25 per-query numbers out of BENCH_r04/r05 ("parsed": null). Also
    # APPEND the full JSON (with a wall-clock stamp) as one JSONL line,
    # so every run stays durable and auditable — a later run must not
    # clobber the history a regression comparison needs. Override the
    # path with $SPARK_GRAFT_BENCH_OUT.
    out = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.jsonl"
        ),
    )
    stamped = json.dumps(
        {
            "ran_at_utc": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
            ),
            **json.loads(payload),
        }
    )
    try:
        with open(out, "a") as f:
            f.write(stamped + "\n")
    except OSError as e:
        print(f"bench: could not write {out}: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
