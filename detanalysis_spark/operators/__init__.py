from .histogram import hist1d, hist2d, hist1d_df, bucket_expr
from .stats import (basic_stats, percentiles, robust_sigma, robust_sigma_expr,
                    passage_fraction_table, trim_outliers, profile_table,
                    key_skew_profile, rank_normalize)
from .binning import (equal_width_edges, equal_frequency_edges, ofamp_edges,
                      assign_bin, ntile_bin)
from .joins import (salted_join, asof_join, range_join_binned,
                    merge_intervals)
from .privacy import (k_anonymity_profile, suppress_small_groups,
                      encrypt_columns, decrypt_columns, pseudonymize)
from .quality import (not_null, in_range, matches, unique, foreign_key,
                      check_table)
from .rollup import (time_bucket, build_rollup, merge_rollups,
                     finalize_rollup, update_rollup, read_rollup,
                     gapfill_buckets)
from .sketches import sketch_distinct, split_overlap_audit
from .sampling import (random_choice, every_nth, log_spaced_indices,
                       log_downsample, polyval, cap_per_key, sessionize,
                       shuffle_key, deterministic_shuffle, assign_batches,
                       assign_split, weighted_sample,
                       weighted_sample_per_key)

__all__ = [
    "salted_join",
    "hist1d", "hist2d", "hist1d_df", "bucket_expr",
    "basic_stats", "percentiles", "robust_sigma", "robust_sigma_expr",
    "passage_fraction_table", "trim_outliers", "profile_table",
    "asof_join", "range_join_binned", "merge_intervals",
    "equal_width_edges", "equal_frequency_edges", "ofamp_edges",
    "assign_bin", "ntile_bin",
    "random_choice", "every_nth", "log_spaced_indices",
    "log_downsample", "polyval", "cap_per_key", "sessionize",
    "shuffle_key", "deterministic_shuffle", "assign_batches",
    "assign_split", "weighted_sample", "weighted_sample_per_key",
    "key_skew_profile", "rank_normalize",
    "time_bucket", "build_rollup", "merge_rollups", "finalize_rollup",
    "update_rollup", "read_rollup", "gapfill_buckets",
    "sketch_distinct", "split_overlap_audit",
    "k_anonymity_profile", "suppress_small_groups",
    "encrypt_columns", "decrypt_columns", "pseudonymize",
    "not_null", "in_range", "matches", "unique", "foreign_key",
    "check_table",
]
