#!/usr/bin/env python
"""Scale-stress validation: do the headline plans scale the way the
100 TB design story claims?

Inflates sf0.1 by 4x and 16x into /tmp/hja_scale/x{K}/ (key-shifted
copies, so join keys stay 1:1, dimensions stay fixed-size like real
TPC-H scaling, and duplicated documents model the real duplicate mass
a crawl corpus has), then times the headline queries at each scale on
the SAME registered implementations — nothing is special-cased, the
sf_dir just points at the inflated data.

Pass/fail intuition recorded in BASELINE.md: data-path-bound queries
should scale ~linearly in rows (constant scheduling floor amortizes);
anything super-linear is a design bug (pair blow-up, driver collect,
broadcast of a growing side).

Usage: python scripts/scale_stress.py [--scales 1,4,16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hadoop_job_analyzer_spark.catalog import COLUMNS, TABLES, table_path
from hadoop_job_analyzer_spark.registry import queries
from hadoop_job_analyzer_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/hja_scale"

# key column to shift per inflated copy (tables absent here replicate
# UNshifted exactly once = fixed-size dimensions)
SHIFT_KEYS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

QUERIES = [
    "agg_group_pricing",
    "join_star_multiway",
    "win_topk_per_group",
    "win_sessionize",
    "dedup_exact",
    "text_wordcount",
    "text_quality",
    "sim_knn_join",
    "dedup_near_minhash",
    "text_fingerprint",
    "sim_ann_ivf",
    "dedup_embedding_bucketed",
    "decon_ngram_overlap",
    "pack_sequences",
    "sketch_countmin",
    "emb_centroid_per_label",
    "dedup_components",
    "corpus_pipeline_e2e",
    "funnel_stages",
    "cohort_retention",
    "join_bucketed",
    # distributed_rank rewrites (r3): global rank with no single-partition
    # window — curves must stay ~flat/linear or the rewrite lied
    "agg_gini_user_activity",
    "text_zipf_fit",
    # r4 wave 3: LSH cross-decon (cap-bounded), window attribution,
    # entropy/seasonal aggs, single-scan funnel
    "decon_near_minhash",
    "join_attribution_asof",
    "agg_user_type_entropy",
    "ts_seasonal_strength_dow",
    "corpus_filter_funnel",
    "text_ngram_novelty",
    "text_vocab_growth",
    "win_activity_rank_global",
    "join_snowflake_q5",
    # r4 waves 6-8: rolling distinct, multi-probe ANN join, AMS state,
    # partitioned-layout write+pruned read
    "ts_dau_wau",
    "sim_knn_join_bucketed",
    "sketch_ams_selfjoin_size",
    "scan_partition_pruned_read",
    # r4 waves 3-9 remainder — every r4-added batch key carries a curve
    "agg_first_digit_benford",
    "agg_apdex_score",
    "agg_hourly_latency_bands",
    "agg_multi_distinct",
    "win_session_length_histogram",
    "ts_seasonal_naive_error",
    "dedup_vector_exact",
    "emb_norm_percentiles",
    "graph_type_cooccurrence",
    "fn_datetime_format",
    "fn_base64_roundtrip",
    "sort_pagination_page2",
    "set_union_byname_evolution",
    "sink_jsonl_roundtrip",
    "corpus_shard_balance",
    "ops_session_report_e2e",
    # r4 waves 11-15
    "win_time_weighted_avg",
    "filter_blocklist_regex",
    "ts_anomaly_robust_mad",
    "ts_merge_intervals",
    "corpus_temperature_weights",
    "text_sentence_stats",
    "corpus_doc_length_histogram",
    "win_pareto_8020",
    # r4 waves 16-18
    "ts_cumulative_daily",
    "emb_dim_variance_top",
    "profile_column_stats",
    "text_casing_profile",
    "win_rank_delta_daily",
    # r5 keys — every new key carries a curve (the r4 discipline)
    "sink_metrics_lines",
    "dedup_near_minhash_full",
    "dedup_components_full",
    "emb_kmeans_iterative",
    "mm_modality_mix_report",
    "sim_range_search",
    "corpus_epoch_plan",
    "ops_job_summary_report",
    "stream_near_dedup_norm",
    "emb_outlier_mahalanobis",
    "text_dup_gram_mass",
    "decon_embedding",
    "join_scd2_pointintime",
    "win_percent_rank_global",
    "emb_binary_quantize",
    "scan_csv_malformed_permissive",
    "udf_pandas_iter",
    "sim_rerank_two_stage",
    "agg_session_bounce_rate",
    "dedup_keeper_quality",
    "join_q4_priority_semi",
    "join_q18_large_orders",
    # r6 keys
    "join_q7_volume_shipping",
    "agg_theil_index",
    "text_edit_distance_join",
    "emb_pca_top_component",
    "join_q19_disjunctive",
    "win_new_vs_returning",
    "ts_burstiness_fano",
    "scan_parquet_metadata",
    "agg_percentile_approx_verdict",
    "agg_psi_drift",
    "agg_ks_binned_drift",
    "join_q21_sole_failing_supplier",
    "win_survival_gap_curve",
    "agg_winsorized_mean",
    "win_session_funnel",
    "sample_weighted_es",
]
# dedup_ngram_jaccard is NOT in the basket: inflation-by-duplication
# pushes every shingle's df past the <=5 rarity filter, so its inflated
# result is trivially empty — a meaningless (and meaninglessly fast) run.
# dedup_components at x16: duplication makes every dup cluster 16x
# denser — pair volume grows (bounded by the 64-doc band-bucket cap),
# rounds stay ~cluster diameter. Measured at every scale since r4
# (round-3 verdict task #5 asked for the x16 number).
SKIP_AT_16: set[str] = set()


# Zipfian-skew remaps (r5 verdict task #5): under --skew, ~20% of the
# fact rows collapse onto ONE hot key (the 100 TB reality join_skew_salted
# exists for). Deterministic (hash of data columns, never rand()):
#   events:   hot user_id = 1 owns ~20% of events (stresses every
#             user-partitioned window/sessionize plan);
#   lineitem: hot l_orderkey = 1 receives ~20% of lineitems (stresses the
#             fact⋈orders shuffle join).
_SKEW_FRACTION_MOD = 5  # 1-in-5 rows → hot key ≈ 20%


def _apply_skew(t: str, df):
    # Each table branch builds its own `hot` predicate (ADVICE r6: a shared
    # first assignment was dead code for lineitem and referenced columns
    # other tables don't have).
    if t == "events":
        hot = F.pmod(F.xxhash64("event_id"), _SKEW_FRACTION_MOD) == 0
        return df.withColumn("user_id", F.when(hot, F.lit(1)).otherwise(F.col("user_id")))
    if t == "lineitem":
        hot = F.pmod(F.xxhash64(F.col("l_orderkey") * 7 + F.col("l_linenumber")), _SKEW_FRACTION_MOD) == 0
        return df.withColumn("l_orderkey", F.when(hot, F.lit(1)).otherwise(F.col("l_orderkey")))
    return df


# Boilerplate-cluster skew (SURVEY r7 item #5 — the one skew scenario the
# r5/r6 program left unmeasured): 1-in-5 DOCUMENTS becomes a near-copy of
# one fixed boilerplate template (template + the doc's first 40 chars, so
# the cluster is a real NEAR-dup cluster, not byte-identical), modelling
# the terms-of-service/nav-chrome mass a crawl corpus carries. This is the
# adversarial input for every shingle/LSH key: 20% of the corpus collides
# into one signature bucket, and the 64-doc band cap is the only thing
# standing between the pair generator and C(0.2·N, 2).
_BOILER = (
    "terms of service agreement please read these terms carefully before "
    "using this site the materials provided are for informational purposes "
    "only and subject to change without notice all rights reserved "
)


def _apply_doc_skew(t: str, df):
    if t != "documents":
        return df
    hot = F.pmod(F.xxhash64("doc_id"), _SKEW_FRACTION_MOD) == 0
    boiler = F.concat(F.lit(_BOILER), F.substring("text", 1, 40))
    return df.withColumn("text", F.when(hot, boiler).otherwise(F.col("text")))


# Jobs-JSONL inflation (r5 verdict task #8): the upstream-report keys read
# a 240-line fixture, so their curves were "flat (fixture-sized)" — no
# information. Inflate the fixture to 128·k copies (x1 ≈ 31k jobs …
# x64 ≈ 2.0M jobs) by repeating the raw line block (the report groups by
# framework; line identity is irrelevant to its cost shape).
_JOBS_BASE_COPIES = 128


def _inflate_jobs(out_dir: str, k: int) -> str:
    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "jobs.jsonl"
    )
    dst = f"{out_dir}/jobs.jsonl"
    if not os.path.exists(dst):
        block = open(src, "rb").read()
        with open(dst, "wb") as f:
            for _ in range(_JOBS_BASE_COPIES * k):
                f.write(block)
    return dst


def inflate(
    spark, k: int, skew: bool = False, skew_docs: bool = False, shift_users: bool = False
) -> str:
    # The dir prefix must encode EVERY flag (ADVICE r7): a combined-mode
    # run previously wrote into another mode's cache and its _DONE marker
    # made the contamination silently reusable.
    if skew and skew_docs:
        prefix = "skew_skewdoc_"
    else:
        prefix = "skewdoc_" if skew_docs else ("skew_" if skew else "")
    if shift_users:
        # User-shifted events (r8, the stream-scale program's state axis):
        # the default inflation shifts only event_id, so user/session
        # cardinality — hence streaming state-store row count — stays
        # CONSTANT across scales (duplication-mass axis). This mode also
        # shifts user_id so copies are new users and stateful-operator
        # state grows k× — the state-store-hostile direction.
        prefix = f"usershift_{prefix}"
    shift_keys = dict(SHIFT_KEYS)
    if shift_users:
        shift_keys["events"] = ["event_id", "user_id"]
    out_dir = f"{OUT}/{prefix}x{k}"
    if os.path.exists(f"{out_dir}/_DONE"):
        _inflate_jobs(out_dir, k)  # r6 addition; older cached dirs lack it
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        raw = spark.read.parquet(table_path(SRC, t))
        if t in shift_keys and k > 1:
            keys = shift_keys[t]
            offs = {c: raw.agg(F.max(c)).collect()[0][0] + 1 for c in keys}
            parts = [raw]
            for i in range(1, k):
                shifted = raw
                for c in keys:
                    shifted = shifted.withColumn(c, F.col(c) + F.lit(i * offs[c]))
                parts.append(shifted)
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
        else:
            df = raw
        if skew:
            df = _apply_skew(t, df)
        if skew_docs:
            df = _apply_doc_skew(t, df)
        df.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
    _inflate_jobs(out_dir, k)
    open(f"{out_dir}/_DONE", "w").close()
    return out_dir


# Scaled-codebook twins (r4 verdict task #3): the registered bucketed-ANN
# keys pin 16 centroids for oracle parity, so their x16 curves conflate
# "more data" with "bigger buckets". These entries re-time them with
# k ≈ √n centroids (the real IVF discipline: per-bucket cost ~constant as
# the corpus grows) — reported under a `_sqrtk` suffix.
def _sqrtk_queries():
    import math

    from hadoop_job_analyzer_spark.catalog import load_table
    from hadoop_job_analyzer_spark.operators.neardup import (
        dedup_embedding_bucketed_at,
        sim_knn_join_bucketed_at,
    )

    def k_sqrt(spark, sf_dir):
        n = load_table(spark, sf_dir, "embeddings").count()
        return max(16, int(round(math.sqrt(n))))

    # k ∝ n (constant ~400-vector buckets): for the PAIR-dedup path the
    # per-bucket work Σ|b|² is n²/k, so only k ∝ n keeps total work
    # linear — k ≈ √n (the query-side optimum) still grows buckets as √n.
    def k_lin(spark, sf_dir):
        n = load_table(spark, sf_dir, "embeddings").count()
        return max(16, n // 400)

    # `_2lvl` twins (r5 verdict task #4): same scaled codebooks through the
    # √k×√k two-level coarse quantizer (_ivf_assign2) — assignment cost
    # n·2√k instead of n·k, the flattening step BASELINE.md:144 identified.
    return {
        "dedup_embedding_bucketed_sqrtk": lambda s, d: dedup_embedding_bucketed_at(
            s, d, k_sqrt(s, d)
        ),
        "sim_knn_join_bucketed_sqrtk": lambda s, d: sim_knn_join_bucketed_at(
            s, d, k_sqrt(s, d)
        ),
        "dedup_embedding_bucketed_klin": lambda s, d: dedup_embedding_bucketed_at(
            s, d, k_lin(s, d)
        ),
        "dedup_embedding_bucketed_sqrtk_2lvl": lambda s, d: dedup_embedding_bucketed_at(
            s, d, k_sqrt(s, d), two_level=True
        ),
        "dedup_embedding_bucketed_klin_2lvl": lambda s, d: dedup_embedding_bucketed_at(
            s, d, k_lin(s, d), two_level=True
        ),
        "sim_knn_join_bucketed_sqrtk_2lvl": lambda s, d: sim_knn_join_bucketed_at(
            s, d, k_sqrt(s, d), two_level=True
        ),
    }


def _jobs_scaled_queries():
    """Upstream-report twin reading the INFLATED jobs.jsonl staged next to
    each scale dir (task #8: a real curve for the report path)."""
    from hadoop_job_analyzer_spark.operators.scans import job_summary_report_at

    return {
        "ops_job_summary_report_scaled": lambda s, d: job_summary_report_at(
            s, os.path.join(d, "jobs.jsonl")
        ),
    }


# Skew basket (r5 verdict task #5): the user-partitioned flagships plus
# join_skew_salted vs an UNSALTED plain twin, timed on the zipfian copies.
def _plain_join_twin(spark, sf_dir):
    from hadoop_job_analyzer_spark.catalog import load_table
    from hadoop_job_analyzer_spark.operators._common import dsum

    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    joined = l.join(o.hint("shuffle_hash"), l["l_orderkey"] == o["o_orderkey"], "inner")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


SKEW_QUERIES = [
    "win_sessionize",
    "win_sessionize_salted",  # r7: (user, day)-salted twin, hash-equal to plain
    "agg_session_bounce_rate_salted",  # r7: salted twin of the degrading KPI
    "funnel_stages",
    "ts_dau_wau",
    "ops_session_report_e2e",
    "agg_session_bounce_rate",
    "join_skew_salted",
]


def time_query(fn, spark, sf_dir: str) -> float:
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,4,16")
    ap.add_argument("--queries", default="", help="comma-separated subset of QUERIES")
    ap.add_argument(
        "--skew",
        action="store_true",
        help="zipfian mode: hot-key inflated copies + the SKEW_QUERIES basket",
    )
    ap.add_argument(
        "--skew-docs",
        action="store_true",
        help="boilerplate-cluster mode: 20%% of documents become near-copies "
        "of one template (the LSH band-cap stress); use with --queries",
    )
    ap.add_argument(
        "--shift-users",
        action="store_true",
        help="also shift events.user_id per inflated copy so user/session "
        "cardinality (and streaming state) grows kx instead of staying "
        "constant; use with --queries",
    )
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    spark = get_spark("hja-scale-stress")
    reg = dict(queries())
    extra = {**_sqrtk_queries(), **_jobs_scaled_queries()}
    reg.update(extra)
    reg["join_plain_unsalted"] = _plain_join_twin
    from hadoop_job_analyzer_spark.operators.windows import (
        agg_session_bounce_rate_salted,
        win_sessionize_salted,
    )

    reg["win_sessionize_salted"] = win_sessionize_salted
    reg["agg_session_bounce_rate_salted"] = agg_session_bounce_rate_salted
    if args.skew:
        basket = SKEW_QUERIES + ["join_plain_unsalted"]
        if args.queries:
            basket = [q for q in basket if q in args.queries.split(",")]
    else:
        basket = [q for q in QUERIES if not args.queries or q in args.queries.split(",")]
        if not args.queries:
            basket = basket + list(extra)
        else:
            basket = basket + [q for q in extra if q in args.queries.split(",")]
    results: dict[str, dict[int, float]] = {q: {} for q in basket}
    for k in scales:
        sf_dir = inflate(
            spark, k, skew=args.skew, skew_docs=args.skew_docs,
            shift_users=args.shift_users,
        )
        for q in basket:
            if k >= 16 and q in SKIP_AT_16:
                continue
            results[q][k] = round(time_query(reg[q], spark, sf_dir), 3)
            print(f"{'skew_' if args.skew else ''}x{k} {q}: {results[q][k]}s", flush=True)
    print(
        json.dumps(
            {
                "metric": "scale_stress_skew_skewdoc"
                if (args.skew and args.skew_docs)
                else (
                    "scale_stress_skewdoc"
                    if args.skew_docs
                    else ("scale_stress_skew" if args.skew else "scale_stress")
                ),
                "base": SRC,
                "results": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
