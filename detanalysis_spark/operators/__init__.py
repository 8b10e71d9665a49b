from .histogram import hist1d, hist2d, hist1d_df, bucket_expr
from .stats import (basic_stats, percentiles, robust_sigma, robust_sigma_expr,
                    passage_fraction_table)
from .binning import (equal_width_edges, equal_frequency_edges, ofamp_edges,
                      assign_bin, ntile_bin)
from .joins import salted_join
from .sampling import (random_choice, every_nth, log_spaced_indices,
                       log_downsample, polyval)

__all__ = [
    "salted_join",
    "hist1d", "hist2d", "hist1d_df", "bucket_expr",
    "basic_stats", "percentiles", "robust_sigma", "robust_sigma_expr",
    "passage_fraction_table",
    "equal_width_edges", "equal_frequency_edges", "ofamp_edges",
    "assign_bin", "ntile_bin",
    "random_choice", "every_nth", "log_spaced_indices",
    "log_downsample", "polyval",
]
