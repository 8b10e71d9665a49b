"""One-call corpus curation: the canonical large-scale training-data
pipeline, assembled from the pillar operators in the order production
pipelines run them:

    normalize → boilerplate strip → [optional C4-style exact line
    dedup] → PII redaction → quality gates (length / repetition /
    language) → benchmark decontamination → exact dedup → near dedup
    (MinHash-LSH) → split assignment

Every cleaning stage is a lazy DataFrame transformation, and each is
individually oracle-checked / pytest'd elsewhere — this module only
composes them. At 100 TB the composition matters: filters run in
pipeline order, so cheap projection gates (length, repetition) prune
rows before the shuffling stages (dedup) ever see them.

When ``near_dup_threshold`` is set the cleaned frame is materialized
(eager ``localCheckpoint``) right before near-dedup: the MinHash
signature scan, the two shingle sides of candidate verification, and
the final anti-join all consume the SAME evaluation of the cleaning
stack instead of re-running boilerplate/PII/quality/decontaminate 3-4
times (at 100 TB that re-execution is a 3× cluster bill). This means
the near-dedup stage executes eagerly during ``curate_corpus()``; with
``near_dup_threshold=None`` the pipeline stays one lazy Catalyst plan
until the caller's first action.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cleaning import (decontaminate, redact_pii,
                       remove_boilerplate_lines, remove_duplicate_lines,
                       repetition_struct)
from .dedup import apply_near_dedup, dedup_exact
from .text import language_id, normalize_text, token_count

__all__ = ["CurationConfig", "curate_corpus",
           "curate_corpus_stream"]


@dataclass
class CurationConfig:
    """Knobs for :func:`curate_corpus`; defaults are the common-crawl
    style settings the pillar queries use."""
    id_col: str = "doc_id"
    text_col: str = "text"
    min_tokens: int = 5
    max_dup_token_ratio: float = 0.6
    max_token_ratio: float = 0.3
    languages: tuple[str, ...] | None = None   # None = no language gate
    boilerplate_min_docs: int | None = None    # None = skip stage
    dedup_lines: bool = False                  # C4-style exact line dedup
    bench: DataFrame | None = None             # None = skip decontaminate
    decontaminate_ngram: int = 5
    near_dup_threshold: float | None = 0.5     # None = exact dedup only
    keep_by: str | None = None                 # near-dedup survivor rule
    split_fractions: dict | None = None        # None = skip split stamp
    split_seed: int = 0


def _quality_pred(cfg: CurationConfig) -> "F.Column":
    """The min-token + repetition quality gate as one predicate Column.
    The repetition struct is bound as a lambda variable so both
    repetition signals share ONE tokenization and signal evaluation per
    row (per-signal dict access would embed — and re-evaluate — the
    whole struct per gate; Catalyst CSE skips lambda-bearing trees)."""
    text = F.col(cfg.text_col)
    # include_ngram=False: the gate reads only dup_token_ratio and
    # max_token_ratio, so the (most expensive) n-gram construction is
    # skipped entirely
    rep_ok = F.get(F.transform(
        F.array(repetition_struct(text, include_ngram=False)),
        lambda r: (r["dup_token_ratio"] <= cfg.max_dup_token_ratio)
        & (r["max_token_ratio"] <= cfg.max_token_ratio)), 0)
    return (token_count(text) >= cfg.min_tokens) & rep_ok


def curate_corpus(docs: DataFrame, config: CurationConfig | None = None,
                  with_counts: bool = False):
    """Run the full curation pipeline; returns ``(curated_df, counts)``.

    ``counts`` is ``{stage: rows_surviving}`` when ``with_counts`` —
    each entry costs one count action (the stages re-run from the lazy
    plan; fine at audit time, skip it in production). With
    ``with_counts=False`` the dict is empty and the cleaning stages stay
    lazy — but when ``near_dup_threshold`` is set the near-dedup stage
    itself executes eagerly (cleaned-frame checkpoint + LSH pair
    materialization; see module docstring).
    """
    cfg = config or CurationConfig()
    counts: dict[str, int] = {}

    # no fan-out spread here: the regex/quality projections are cheap
    # native work and the probe + round-robin exchange were
    # A/B-measured a net loss (OPTIMIZATION_r12.md); at scale inputs
    # arrive wide anyway and downstream near-dup ops spread themselves

    def tick(stage: str, df: DataFrame) -> DataFrame:
        if with_counts:
            counts[stage] = df.count()
        return df

    out = tick("input", docs)

    if cfg.boilerplate_min_docs is not None:
        out = remove_boilerplate_lines(
            out, id_col=cfg.id_col, text_col=cfg.text_col,
            min_docs=cfg.boilerplate_min_docs)
        out = out.drop(cfg.text_col) \
                 .withColumnRenamed("clean_text", cfg.text_col) \
                 .drop("n_lines_kept")
        out = tick("boilerplate", out)

    if cfg.dedup_lines:
        out = remove_duplicate_lines(out, id_col=cfg.id_col,
                                     text_col=cfg.text_col)
        out = out.drop(cfg.text_col) \
                 .withColumnRenamed("clean_text", cfg.text_col) \
                 .drop("n_lines_kept")
        out = tick("line_dedup", out)

    out = out.withColumn(cfg.text_col,
                         redact_pii(F.col(cfg.text_col)))

    # dedup keys normalize the CLEANED text — two docs identical after
    # boilerplate/PII cleaning must collapse even if the raw crawls
    # differed in exactly the stripped content
    out = out.withColumn("__norm__", normalize_text(F.col(cfg.text_col)))

    # one conjunctive filter node; the repetition struct is bound once
    # per row so both gates share one tokenization + signal evaluation
    out = out.filter(_quality_pred(cfg))
    out = tick("quality", out)

    if cfg.languages is not None:
        out = out.filter(
            language_id(F.col(cfg.text_col)).isin(*cfg.languages))
        out = tick("language", out)

    if cfg.bench is not None:
        # barrier: decontaminate consumes the cleaned frame TWICE (the
        # gram-explode side and the anti-join side); without a
        # materialization the whole upstream cleaning stack (PII
        # regexes + quality signals) re-evaluates for each subtree.
        # Same reasoning as the near-dedup checkpoint below — executor
        # local storage for the cleaned corpus is the standard trade
        # at scale (or write it to parquet between stages).
        out = out.localCheckpoint(eager=True)
        out = decontaminate(out, cfg.bench, id_col=cfg.id_col,
                            text_col=cfg.text_col,
                            n=cfg.decontaminate_ngram)
        out = tick("decontaminated", out)

    out = dedup_exact(out, ["__norm__"], cfg.id_col)
    out = tick("exact_dedup", out)

    if cfg.near_dup_threshold is not None:
        # barrier: one evaluation of the whole cleaning stack, shared by
        # the signature scan, both verify join sides, and the final
        # anti-join (see module docstring)
        out = out.localCheckpoint(eager=True)
        out = apply_near_dedup(out, id_col=cfg.id_col,
                               text_col=cfg.text_col,
                               threshold=cfg.near_dup_threshold,
                               keep_by=cfg.keep_by)
        out = tick("near_dedup", out)

    out = out.drop("__norm__")

    if cfg.split_fractions is not None:
        from ..operators.sampling import assign_split
        out = assign_split(out, cfg.id_col, cfg.split_fractions,
                           seed=cfg.split_seed)

    return out, counts


def curate_corpus_stream(sdf: DataFrame,
                         config: CurationConfig | None = None,
                         dedup_watermark_col: str | None = None,
                         dedup_delay: str = "10 minutes") -> DataFrame:
    """The curation pipeline on an UNBOUNDED stream — the ingest-time
    counterpart of :func:`curate_corpus`, composed from the stages that
    stream:

    - PII redaction, normalization, quality/repetition/language gates,
      split assignment: stateless projections — the SAME expressions as
      batch (proven equal in tests/test_streaming.py).
    - Benchmark decontamination: ``arrays_overlap`` of each document's
      shingle array against the benchmark gram set as a literal array
      (benchmarks are MBs by definition, so the one-time driver
      materialization is bounded) — a pure projection, because the
      batch path's per-doc hit-count AGGREGATION is not available on
      an unwatermarked stream in append mode. Matches batch exactly
      for the default ``max_hits=0`` ("any overlap drops the doc").
    - Exact dedup: first-seen-wins streaming state on the normalized
      content hash (:func:`streaming.streaming_dedup_exact`); pass
      ``dedup_watermark_col`` to bound state on an unbounded crawl.

    Corpus-wide stages that need a full pass (boilerplate line
    frequencies, MinHash near-dedup clustering) cannot stream — run
    them as periodic batch compaction over the sink
    (``stream_to_parquet`` + :func:`curate_corpus`), or screen
    near-dups in-flight with ``streaming_near_dup_hits``. Dedup keeps
    the FIRST ARRIVAL per normalized text (arrival order is the
    stream's id order), where batch keeps min-id — identical when
    files arrive in id order.

    Returns the streaming DataFrame (same columns as batch output,
    minus near-dedup); sink it with ``stream_to_parquet``.
    """
    from ..streaming.continuous import streaming_dedup_exact

    cfg = config or CurationConfig()
    # corpus-wide stages cannot stream: fail loudly instead of silently
    # producing a different corpus than the batch run would
    if cfg.boilerplate_min_docs is not None or cfg.dedup_lines:
        raise ValueError(
            "boilerplate_min_docs / dedup_lines need a full corpus pass "
            "and cannot stream — run them as batch compaction over the "
            "sink (stream_to_parquet + curate_corpus)")
    if cfg.near_dup_threshold is not None:
        import warnings
        warnings.warn(
            "near_dup_threshold is ignored on the stream path (MinHash "
            "clustering needs the full corpus); screen in-flight with "
            "streaming_near_dup_hits or near-dedup in batch compaction",
            stacklevel=2)
    out = sdf.withColumn(cfg.text_col, redact_pii(F.col(cfg.text_col)))
    out = out.withColumn("__norm__", normalize_text(F.col(cfg.text_col)))

    out = out.filter(_quality_pred(cfg))

    if cfg.languages is not None:
        out = out.filter(
            language_id(F.col(cfg.text_col)).isin(*cfg.languages))

    if cfg.bench is not None:
        from .cleaning import benchmark_ngrams
        from .dedup import word_shingles
        gram_rows = benchmark_ngrams(
            cfg.bench, cfg.text_col, cfg.decontaminate_ngram).collect()
        grams = [r["gram"] for r in gram_rows]
        if grams:
            # ONE typed array literal — per-gram F.lit()s would build a
            # Catalyst node per gram (millions for a real benchmark)
            bench_arr = F.lit(grams)
            doc_grams = word_shingles(F.col(cfg.text_col),
                                      cfg.decontaminate_ngram)
            out = out.filter(~F.arrays_overlap(doc_grams, bench_arr))

    out = streaming_dedup_exact(out, ["__norm__"],
                                watermark_col=dedup_watermark_col,
                                delay=dedup_delay)
    out = out.drop("__norm__")

    if cfg.split_fractions is not None:
        from ..operators.sampling import assign_split
        out = assign_split(out, cfg.id_col, cfg.split_fractions,
                           seed=cfg.split_seed)
    return out
