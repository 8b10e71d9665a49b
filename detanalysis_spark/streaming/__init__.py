"""Structured Streaming layer: unbounded trace sources, the stateful
rechunker, and incremental moment accumulation (SURVEY §2 ST1-ST3)."""

from .continuous import (read_continuous_stream, rechunk_stream,
                         streaming_psd_moments, run_available_now,
                         streaming_dedup_exact, streaming_windowed_counts,
                         streaming_lsh_index_hits,
                         streaming_near_dup_hits, streaming_session_counts,
                         stream_to_parquet, streaming_ann_topk,
                         streaming_ann_topk_microbatch,
                         streaming_rollup_deltas, read_rollup_from_deltas,
                         streaming_upsert,
                         streaming_cross_deltas,
                         read_cross_moments_from_deltas)

__all__ = ["read_continuous_stream", "rechunk_stream",
           "streaming_psd_moments", "run_available_now",
           "streaming_dedup_exact", "streaming_windowed_counts",
           "streaming_lsh_index_hits",
           "streaming_near_dup_hits", "streaming_session_counts",
           "stream_to_parquet", "streaming_ann_topk",
           "streaming_ann_topk_microbatch",
           "streaming_rollup_deltas", "read_rollup_from_deltas",
           "streaming_upsert", "streaming_cross_deltas",
           "read_cross_moments_from_deltas"]
