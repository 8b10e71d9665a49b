"""sf1-equivalent oracle gate for the heavy operator families.

There is no driver-generated sf1 dataset, so this tool materializes one
(~10x sf0.1: 6M lineitem, 1M events, 50k documents, 20k embeddings) by
replicating the sf0.1 parquet with shifted identities — same value
distributions, 10x the cardinality — and then runs the standard DuckDB
value-hash gate (`tools/check_oracles.py`) against it for the
dedup / text-LM / BPE / cleaning / rollup / embedding families. Both
engines read the SAME materialized files, so the comparison is exact.

Replication semantics (deterministic, honest at scale):
- fact tables: primary ids shifted by copy*1e9 (distinct identities,
  FK columns into dimension tables untouched);
- documents: doc_id shifted, text suffixed with the COPY index only —
  within-copy duplicate structure (planted dup groups) is preserved
  exactly (10x the groups) and copies never merge;
- embeddings: vec_id shifted, vectors perturbed per copy (no 10-way
  cosine ties);
- dimension tables copied as-is.

Excluded families (documented, same reasoning as the sf0.1 gate): the
O(n^2)-oracle six (minhash/embedding near-dup all-pairs, simhash,
cluster-pairwise SemDeDup, the near-dedup-bearing capstones) — DuckDB's
oracle is quadratic there, not the engine; and the doc_id<N bounded
probes (hashed_classifier, multimodal_jpeg) whose filter pins them to
copy 0, making a 10x run vacuous.

Usage: python tools/sf1_gate.py [--force-rebuild] [query ...]
"""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/detanalysis_sf1x")
COPIES = 10
SHIFT = 1_000_000_000

# per-table amplification SQL (c = copy index 0..COPIES-1)
_AMPLIFY = {
    "lineitem": "SELECT l_orderkey + c*{S} AS l_orderkey, "
                "* EXCLUDE (l_orderkey) FROM t, range({K}) r(c)",
    "orders": "SELECT o_orderkey + c*{S} AS o_orderkey, "
              "* EXCLUDE (o_orderkey) FROM t, range({K}) r(c)",
    "events": "SELECT event_id + c*{S} AS event_id, "
              "user_id + c*{S} AS user_id, "
              "* EXCLUDE (event_id, user_id) FROM t, range({K}) r(c)",
    "documents": "SELECT doc_id + c*{S} AS doc_id, "
                 "text || ' copytoken' || c AS text, "
                 "* EXCLUDE (doc_id, text) FROM t, range({K}) r(c)",
    "embeddings": "SELECT vec_id + c*{S} AS vec_id, "
                  "list_transform(embedding, x -> x + c * 1e-3) "
                  "AS embedding, "
                  "* EXCLUDE (vec_id, embedding) FROM t, range({K}) r(c)",
}
_COPY_AS_IS = ["region", "nation", "customer", "supplier", "part"]

# heavy families with linear (or output-bound) DuckDB oracles
GATE_QUERIES = [
    # exact/normalized/span/line dedup
    "dedup_exact_documents", "dedup_exact_by_key",
    "normalized_dedup_groups", "incremental_dedup_stats",
    "span_dedup_stats", "line_dedup_first_occurrence",
    # text analysis / LM / BPE
    "doc_token_stats", "language_id_counts", "text_quality_by_source",
    "doc_fingerprint_stats", "vocab_top_terms", "tfidf_top_terms",
    "unigram_nll_scores", "bigram_nll_scores", "bpe_first_merge_pairs",
    # cleaning
    "gopher_rule_counts", "repetition_char_frac_stats",
    "pii_redaction_stats", "boilerplate_removal_stats",
    "adaptive_quality_stats", "decontamination_stats",
    # rollups / time
    "incremental_rollup_stats", "gapfilled_daily_series",
    "sessionized_event_counts", "merged_interval_islands",
    "asof_join_purchase_error_lag", "range_join_value_intervals",
    # embeddings / ANN (linear oracles)
    "ann_cosine_topk", "ann_ivf_topk", "embedding_centroids_by_label",
    "embedding_covariance_stats", "embedding_outlier_stats",
    "embedding_quantization_stats",
    # sampling / packing
    "sequence_packing_stats", "token_budget_sample_stats",
    "split_assignment_counts", "mixture_sample_stats",
    # streaming (micro-batch drains) and the full-table FLAC codec path
    # (multimodal_jpeg_stats is doc_id<200-bounded -> vacuous at 10x)
    "streaming_rollup_day_stats", "streaming_ann_microbatch_topk",
    "multimodal_flac_stats", "streaming_psd_stats",
    # semiauto cut family (round 5): threshold-on-subsample semantics,
    # binned thresholds, count cuts, interval cuts, master folds —
    # oracles are single-pass window/agg SQL, linear at any sf
    "semiauto_sigma_cut", "semiauto_time_binned_cut",
    "semiauto_ofamp_binned_cut", "semiauto_count_cut",
    "semiauto_interval_cut", "semiauto_master_combine",
    "master_randoms_passfrac", "passfrac_trigger_splits",
    # passage-fraction + vibration/photon ensemble aggregates (round 5)
    "passage_fraction_counts", "passfrac_sequential_matrix",
    "vibration_sweep_moments", "vibration_psd_by_channel",
    "vibration_transfer_functions", "photon_peak_counts",
    "photon_average_pulses",
    # TPC-H-family joins/aggs + table profiles (round 5): all
    # order-insensitive single-pass aggregations or
    # deterministically-tie-broken windows — linear oracles at any sf.
    # (theta/HLL sketch queries stay out: their exact-mode bound
    # [4096 entries] is exceeded at 10x cardinality, so the sketch
    # legitimately goes approximate while the SQL oracle stays exact.)
    "tpch_q1_pricing_summary", "join_revenue_by_nation",
    "broadcast_part_revenue", "salted_join_brand_revenue",
    "rollup_order_revenue", "pivot_priority_by_status",
    "describe_events", "orders_table_profile", "data_quality_orders",
    "k_anonymity_events", "percentile_quantity_by_flag",
    "robust_sigma_by_event_type", "hist1d_event_value",
    "hist1d_mean_quantity", "hist2d_quantity_discount",
    "trimmed_price_stats", "grouped_regression_stats",
    "moving_avg_event_value", "every_nth_downsample",
    "json_props_stats", "topk_orders_per_priority", "ntile_time_bins",
    # round 6: bloom prefilter dedup, jsonl ingest round trip, URL
    # provenance gates, small-file compaction — all linear oracles
    "bloom_incremental_dedup_stats", "jsonl_ingest_stats",
    "domain_curation_stats", "compacted_scan_stats",
    "html_extraction_stats", "image_phash_band_stats",
    "bm25_retrieval_scores", "temperature_mixture_stats",
    "pq_adc_exact_topk", "orc_ingest_stats", "term_pmi_stats",
    "exact_stratified_sample_stats",
    # round 8 widening (VERDICT r7 #4): every remaining linear-oracle
    # family. Cut algebra / masks / selections over events+lineitem:
    "flagship_event_cut_stats", "box_cut_counts", "cut_algebra_xor",
    "global_filter_algebra", "saved_selection_counts",
    "semi_join_high_value", "anti_join_customers_no_orders",
    "polynomial_cut_counts", "time_binned_count_exclusion",
    "eqfreq_binned_passfrac", "uneven_bins_extendedprice",
    "union_all_scan", "incremental_append_ids", "distinct_event_types",
    # array kernels + picker point lookup:
    "array_baseline_centered_mean", "array_energy_by_label",
    "nearest_event_pick",
    # text / sampling / capstones with exact (window) dedup only:
    "chunked_documents_stats", "domain_cap_counts",
    "rank_normalized_quality", "repetition_quality_stats",
    "weighted_sample_stats", "training_batch_stats",
    "training_pipeline_stats", "curated_corpus_exact_stats",
    # multimodal full-table codec paths (jpeg stays out: doc_id<200):
    "multimodal_image_stats", "multimodal_audio_stats",
    # layout / profile / diff:
    "key_skew_profile_orders", "manifest_pruned_scan",
    "snapshot_diff_counts",
    # streaming drains (all bounded availableNow, linear state):
    "streaming_event_counts", "streaming_session_stats",
    "streaming_windowed_stats", "streaming_ann_state_topk",
    # round 8 additions: URL canonicalization, the events-as-datasets
    # HDF5 trace walker round trip, and the WET record reader round
    # trip (all arithmetic-constructed, linear)
    "url_normalization_stats", "trace_hdf5_ingest_stats",
    "wet_ingest_stats", "ivf_absorb_centroid_stats",
    # round 9: the three constructible-oracle upgrades (all linear —
    # axis-plane LSH buckets, planted-token simhash, planted-sinusoid
    # FFT ensemble)
    "ann_lsh_topk", "simhash_candidate_distances", "photon_fft_dpdi",
    "lowpass_kernel_embeddings", "unicode_cleaning_stats", "mojibake_repair_stats",
    # round 9 session additions: two-pass heavy hitters, CSV/WARC
    # ingest round trips, COW MERGE replay, script detection, Luhn
    # card PII — all linear oracles
    "heavy_hitter_tokens", "csv_ingest_stats", "warc_ingest_stats",
    "upsert_merge_stats", "script_detection_stats",
    "pii_card_luhn_stats", "sorted_neighborhood_stats",
    "zipf_corpus_fit", "cm_sketch_event_counts",
    "pagerank_doc_graph", "streaming_cm_sketch_counts",
]
# Still excluded, and why (the full residue — everything else gates):
# - quadratic DuckDB oracles (the engine is banded/bucketed; the
#   oracle is all-pairs): near_dup_pairs_minhash,
#   near_dup_cluster_sizes, embedding_near_dup_pairs,
#   semantic_dedup_stats, semantic_curation_stats,
#   streaming_near_dup_screen_stats, curated_corpus_stats (round-9
#   oracle: all-pairs near-dedup leg), interval_overlap_stats (overlap
#   pair count itself grows ~quadratically under value-range-preserving
#   amplification), jaccard_pairs_exact / jaccard_pairs_prefix_filtered
#   / containment_superset_pairs (all-pairs shingle oracles),
#   knn_graph_label_blocks (label-blocked pair oracle grows ~100x under
#   10x blocks);
# - bounded probes pinned to copy 0 (vacuous at 10x): token_cosine
#   (doc_id<100), audio_fingerprint_pairs (doc_id<300),
#   hashed_classifier_scores, multimodal_jpeg_stats (doc_id<200);
# - fuzzy_join_typos: vocabulary comes from part (copied as-is), so a
#   10x run is literally the same data — vacuous, not risky;
# - sketch exact-mode bound (4096) exceeded at 10x — sketch goes
#   legitimately approximate while SQL stays exact:
#   theta_split_overlap, sketch_rollup_day_profile;
# - no SQL oracle by design (rows-only tier, 2 after the round-9
#   constructible-oracle upgrades): approx_percentile_profile (sketch
#   is not DuckDB's sketch), grouped_spectrum_fits (iterative LM fit).


def materialize(force: bool = False) -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in _COPY_AS_IS + list(_AMPLIFY):
        dst = f"{OUT}/{t}.parquet"
        if os.path.exists(dst) and not force:
            continue
        src = f"{SRC}/{t}.parquet"
        if not os.path.exists(src):
            continue
        sql = _AMPLIFY.get(t, "SELECT * FROM t").format(K=COPIES, S=SHIFT)
        con.execute(f"CREATE OR REPLACE VIEW t AS "
                    f"SELECT * FROM read_parquet('{src}')")
        con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"# materialized {t}: {n} rows", file=sys.stderr)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    materialize(force="--force-rebuild" in sys.argv)
    env = dict(os.environ, SPARK_GRAFT_ORACLE_SF_DIR=OUT)
    names = args or GATE_QUERIES
    return subprocess.call(
        [sys.executable, os.path.join(HERE, "check_oracles.py"), *names],
        env=env)


if __name__ == "__main__":
    raise SystemExit(main())
