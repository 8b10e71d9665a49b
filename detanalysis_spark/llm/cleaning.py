"""Training-data cleaning operators: PII scrubbing, repetition signals,
benchmark decontamination.

These are the standard "safety and leakage" stages of a large-scale
LLM data pipeline, built to run at 100 TB:

- **PII detection/redaction** is pure JVM regex (``regexp_extract_all``
  / ``regexp_replace`` inside whole-stage codegen) — a per-row
  projection with no shuffle, so it streams at scan speed.
- **Repetition signals** (duplicate-token / duplicate-n-gram ratios,
  Gopher-style quality gates) are native array expressions — again a
  shuffle-free projection.
- **Decontamination** explodes each document's *distinct* n-grams and
  semi-joins them against the benchmark's n-gram set. Benchmarks are
  tiny relative to the corpus, so the gram set is **broadcast**: the
  corpus side never shuffles and the cost is one scan + one local join.

Every regex is in the portable subset Java regex (Spark) and RE2
(DuckDB oracle) interpret identically: explicit character classes,
no lookaround, no backreferences.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PII_PATTERNS", "pii_counts", "redact_pii",
    "CARD_CANDIDATE_PATTERN", "luhn_valid", "credit_card_count",
    "repetition_scores", "repetition_struct",
    "benchmark_ngrams", "contamination_overlap",
    "line_frequencies", "remove_boilerplate_lines",
    "remove_duplicate_lines", "decontaminate",
    "adaptive_quality_filter",
    "GOPHER_DEFAULTS", "GOPHER_FIELDS", "gopher_quality_struct",
    "gopher_quality_flags", "gopher_quality_filter",
    "repetition_char_fractions", "repetition_char_fractions_grouped",
    "SECOND_LEVEL_SUFFIXES", "url_host", "registered_domain",
    "domain_blocklist_filter", "domain_profile",
    "strip_html", "strip_invisible", "nfc_normalize",
    "INVISIBLE_CLASS", "fix_mojibake",
]

# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------
# Ordered: redaction applies them in this sequence (ssn before phone —
# both are digit-dash shapes; email before ipv4 so hostnames with
# dotted quads redact as one email, matching the SQL oracle chain).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "phone": r"[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}",
    "ipv4": r"[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}",
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Occurrence count per PII kind — ``{kind: IntegerType column}``.

    ``size(regexp_extract_all(...))`` keeps the whole thing inside
    codegen; nothing crosses to Python.
    """
    return {kind: F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
            for kind, pat in PII_PATTERNS.items()}


def redact_pii(text: Column, kinds: list[str] | None = None,
               token: str = "[PII]") -> Column:
    """Replace every PII match with ``token``, applying
    :data:`PII_PATTERNS` in declaration order (so overlapping shapes —
    ssn vs phone — resolve deterministically, identically to a chained
    ``regexp_replace`` SQL oracle)."""
    out = text
    for kind, pat in PII_PATTERNS.items():
        if kinds is not None and kind not in kinds:
            continue
        out = F.regexp_replace(out, pat, token)
    return out


# ---------------------------------------------------------------------------
# repetition / quality gates (Gopher-style)
# ---------------------------------------------------------------------------
def _tokens(text: Column) -> Column:
    # split on \s+ then drop empty boundary tokens — Python
    # str.split() semantics (same fix as llm/text._tokens: SQL trim
    # strips only ' ', so trim-then-split kept phantom empty tokens
    # around leading/trailing newlines/tabs)
    return F.filter(F.split(text, r"\s+"), lambda x: x != "")


def repetition_struct(text: Column, n: int = 2,
                      include_ngram: bool = True) -> Column:
    """Repetition signals over whitespace tokens as ONE struct Column
    (``dup_token_ratio``, ``dup_ngram_ratio``, ``max_token_ratio``),
    all native array ops:

    - ``dup_token_ratio``: ``1 - distinct_tokens / tokens`` (0 for
      empty text).
    - ``dup_ngram_ratio``: ``1 - distinct_ngrams / ngrams`` for word
      ``n``-grams (0 when fewer than ``n`` tokens).
    - ``max_token_ratio``: frequency of the most common token divided
      by the token count — the classic "one word dominates" gate.

    The token array is bound once per row via a one-element array
    transform (the same trick as ``word_shingles``) so the regex split
    is not re-evaluated per lambda element. ``include_ngram=False``
    pins ``dup_ngram_ratio`` to 0.0 (same schema) and skips the gram
    construction — the n-gram signal is the most expensive of the
    three, so gates that don't read it shouldn't pay for it.
    """
    def per_row(tk: Column) -> Column:
        n_tok = F.size(tk)
        n_gram = F.greatest(n_tok - (n - 1), F.lit(0))
        if not include_ngram:
            grams = F.array().cast("array<string>")
        elif n == 2:
            # bigram fast path: one zip_with pass (pairs each token
            # with its successor) instead of per-index slice+concat
            grams = F.when(n_gram >= 1, F.zip_with(
                F.slice(tk, 1, F.greatest(n_tok - 1, F.lit(0))),
                F.slice(tk, 2, F.greatest(n_tok - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b))) \
                .otherwise(F.array().cast("array<string>"))
        else:
            grams = F.when(n_gram >= 1, F.transform(
                F.sequence(F.lit(1), n_gram),
                lambda i: F.concat_ws(" ", F.slice(tk, i, n)))) \
                .otherwise(F.array().cast("array<string>"))
        dup_tok = F.when(n_tok > 0,
                         1.0 - F.size(F.array_distinct(tk)) / n_tok) \
            .otherwise(F.lit(0.0))
        dup_ngram = F.lit(0.0) if not include_ngram else \
            F.when(n_gram > 0,
                   1.0 - F.size(F.array_distinct(grams)) / n_gram) \
            .otherwise(F.lit(0.0))
        # max frequency == longest equal-run in the SORTED token array:
        # O(n log n) sort + one linear fold, instead of the quadratic
        # distinct×filter scan (O(distinct·n) per row — ruinous for
        # long documents: a 100k-token doc costs ~10^10 comparisons
        # that way, ~10^6 this way). Same value exactly.
        st = F.array_sort(tk)
        best_run = F.aggregate(
            st,
            F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                     F.lit(0).alias("best")),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x == acc["prev"], acc["run"] + 1)
                 .otherwise(F.lit(1)).alias("run"),
                F.greatest(
                    acc["best"],
                    F.when(x == acc["prev"], acc["run"] + 1)
                     .otherwise(F.lit(1))).alias("best")),
            lambda acc: acc["best"])
        max_tok = F.when(n_tok > 0, best_run / n_tok) \
            .otherwise(F.lit(0.0))
        return F.struct(dup_tok.alias("dup_token_ratio"),
                        dup_ngram.alias("dup_ngram_ratio"),
                        max_tok.alias("max_token_ratio"))

    return F.transform(F.array(_tokens(text)), per_row)[0]


def repetition_scores(text: Column, n: int = 2) -> dict[str, Column]:
    """Per-signal view of :func:`repetition_struct` — each entry embeds
    its own copy of the struct (one tokenization AND one full signal
    evaluation per selected entry). Predicates referencing several
    signals should bind the struct once instead:
    ``F.get(F.transform(F.array(repetition_struct(c)), lambda r: ...), 0)``.
    """
    s = repetition_struct(text, n)
    return {"dup_token_ratio": s["dup_token_ratio"],
            "dup_ngram_ratio": s["dup_ngram_ratio"],
            "max_token_ratio": s["max_token_ratio"]}


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------
def benchmark_ngrams(bench: DataFrame, text_col: str = "text",
                     n: int = 5) -> DataFrame:
    """Distinct word ``n``-grams of a benchmark corpus — one column
    ``gram``. Small by construction (benchmarks are MBs, not TBs)."""
    from .dedup import word_shingles
    return (bench
            .select(F.explode(word_shingles(F.col(text_col), n)).alias("gram"))
            .distinct())


def contamination_overlap(docs: DataFrame, bench_grams: DataFrame,
                          id_col: str = "doc_id", text_col: str = "text",
                          n: int = 5,
                          carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """Per-document benchmark overlap: ``(id, *carry, n_grams, n_hits)``.

    One shingle pass, one shuffle: each doc's *distinct* grams are
    exploded (``explode_outer`` so gram-less docs survive) and
    left-joined against the **broadcast** benchmark gram set, then hit
    counts fold back per doc in a single map-side-combined groupBy —
    the corpus itself never shuffles by gram, so this scales linearly
    in corpus size. ``carry_cols`` ride along (e.g. ``source``) so
    callers don't need a second join back to the corpus.
    """
    from .dedup import word_shingles
    carry = list(carry_cols)
    marked = bench_grams.select("gram").withColumn("__hit__", F.lit(1))
    grams = docs.select(F.col(id_col), *[F.col(c) for c in carry],
                        word_shingles(F.col(text_col), n).alias("__grams__"))
    exploded = grams.select(id_col, *carry,
                            F.size("__grams__").alias("__n_grams__"),
                            F.explode_outer("__grams__").alias("gram"))
    return (exploded
            .join(F.broadcast(marked), "gram", "left")
            .groupBy(id_col, *carry)
            .agg(F.max("__n_grams__").alias("n_grams"),
                 F.coalesce(F.sum("__hit__"), F.lit(0)).cast("long")
                 .alias("n_hits")))


# ---------------------------------------------------------------------------
# boilerplate line removal
# ---------------------------------------------------------------------------
def line_frequencies(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     delim: str = "\n") -> DataFrame:
    """``(line, n_docs)``: how many distinct documents contain each
    line. One explode + one map-side-combined groupBy keyed by line —
    the classic first pass of boilerplate detection (headers, footers,
    cookie banners repeat across a crawl; body text doesn't)."""
    import re as _re
    lines = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(
            # F.split takes a regex; the delimiter is a literal
            F.split(F.col(text_col), _re.escape(delim)))).alias("line"))
    return (lines.groupBy("line")
            .agg(F.count(F.lit(1)).alias("n_docs")))


def _explode_lines(docs: DataFrame, id_col: str, text_col: str,
                   delim: str) -> DataFrame:
    """(id, pos, line) — split's pattern arg is a regex; the rebuild's
    array_join delim is literal, so escape to keep both sides agreeing
    for any delimiter."""
    import re as _re
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _re.escape(delim)))
        .alias("pos", "line"))


def _rebuild_docs(docs: DataFrame, kept: DataFrame, id_col: str,
                  delim: str, out_col: str) -> DataFrame:
    """Reassemble surviving (id, pos, line) rows into per-doc text,
    order-exact (sorted (pos, line) structs, not collect_list luck);
    docs whose every line was dropped come back with empty text."""
    rebuilt = (kept.groupBy(id_col)
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct(F.col("pos"), F.col("line")))),
                       lambda s: s["line"]),
                   delim).alias(out_col),
                   F.count(F.lit(1)).alias("n_lines_kept")))
    return (docs.join(rebuilt, id_col, "left")
            .withColumn(out_col, F.coalesce(F.col(out_col), F.lit("")))
            .withColumn("n_lines_kept",
                        F.coalesce(F.col("n_lines_kept"), F.lit(0))))


def remove_boilerplate_lines(docs: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text", min_docs: int = 100,
                             delim: str = "\n",
                             out_col: str = "clean_text") -> DataFrame:
    """Strip lines that appear in ≥ ``min_docs`` documents, preserving
    the order of the surviving lines.

    Scale shape: the frequent-line set is small by construction (a line
    must repeat across ``min_docs`` docs to qualify), so it
    **broadcasts** to a left-anti join against the exploded lines; the
    only corpus-sized shuffle is the per-doc rebuild groupBy.
    """
    frequent = (line_frequencies(docs, id_col, text_col, delim)
                .filter(F.col("n_docs") >= min_docs)
                .select("line"))
    exploded = _explode_lines(docs, id_col, text_col, delim)
    kept = exploded.join(F.broadcast(frequent), "line", "left_anti")
    return _rebuild_docs(docs, kept, id_col, delim, out_col)


def remove_duplicate_lines(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", delim: str = "\n",
                           out_col: str = "clean_text") -> DataFrame:
    """Corpus-wide first-occurrence-wins line dedup (the C4/RefinedWeb
    exact line-dedup rule): every line occurrence is dropped unless it
    is the FIRST occurrence in the corpus, ordered by
    (``id_col``, position). Complements
    :func:`remove_boilerplate_lines` — that rule is frequency-based
    (drop everywhere once common), this one keeps exactly one copy of
    every repeated line.

    Scale shape: one line-keyed shuffle finds each line's first
    (doc, pos) via a min-struct aggregate (map-side combined — no
    window over the exploded corpus), the exploded lines join back on
    the line key, and one per-doc rebuild groupBy restores order.
    Documents reduced to nothing come back with empty text.

    Empty lines (paragraph separators — '' between two delimiters) are
    structure, not content: they pass through untouched, as in the real
    C4/RefinedWeb implementations, so dedup never reflows paragraphs.
    """
    exploded = _explode_lines(docs, id_col, text_col, delim)
    content = exploded.filter(F.col("line") != "")
    first = (content.groupBy("line")
             .agg(F.min(F.struct(F.col(id_col).alias("d"),
                                 F.col("pos").alias("p"))).alias("f")))
    kept_content = (content.join(first, "line")
                    .filter((F.col(id_col) == F.col("f.d"))
                            & (F.col("pos") == F.col("f.p")))
                    .drop("f"))
    kept = kept_content.unionByName(
        exploded.filter(F.col("line") == ""))
    return _rebuild_docs(docs, kept, id_col, delim, out_col)


def decontaminate(docs: DataFrame, bench: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 5, max_hits: int = 0) -> DataFrame:
    """Drop corpus documents that share more than ``max_hits`` word
    ``n``-grams with the benchmark.

    Unlike the auditing :func:`contamination_overlap` (which must
    return a row for EVERY document, hits or not), the filter only
    needs ids whose hit count exceeds ``max_hits`` — so the exploded
    gram rows INNER-join the broadcast benchmark set and non-hits die
    map-side, before the shuffle. The per-doc hit count then
    aggregates only HIT rows (bounded by contamination volume, not
    corpus × grams-per-doc), and the surviving ids feed one left-anti
    join. The corpus itself never shuffles."""
    grams = benchmark_ngrams(bench, text_col, n)
    from .dedup import word_shingles
    hits = (docs.select(F.col(id_col),
                        F.explode(word_shingles(F.col(text_col), n))
                        .alias("gram"))
            .join(F.broadcast(grams.select("gram")), "gram")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_hits")))
    bad = hits.filter(F.col("n_hits") > max_hits).select(id_col)
    return docs.join(bad, id_col, "left_anti")


def adaptive_quality_filter(docs: DataFrame, score: "Column | str",
                            group_col: str, quantile: float = 0.5,
                            keep: str = "above",
                            id_col: str = "doc_id") -> DataFrame:
    """Per-group adaptive quality gating: keep documents whose quality
    ``score`` clears their OWN group's ``quantile`` — per-language /
    per-domain thresholds instead of one global cutoff (a global
    threshold set on English tails deletes whole low-resource
    languages; the adaptive rule keeps each group's best half).

    ``keep='above'`` keeps score >= the group quantile, ``'below'``
    keeps score <= it. Returns ``docs`` plus a ``__q__`` threshold
    column dropped from the output.

    Scale shape: exact per-group percentile is ONE aggregate keyed by
    the group (percentile is an associative-merge aggregate in Spark);
    the thresholds frame is (groups) small, broadcasts back, and the
    filter is a per-row comparison. The corpus is never shuffled.
    """
    if keep not in ("above", "below"):
        raise ValueError("keep must be 'above' or 'below'")
    if not 0.0 <= quantile <= 1.0:
        raise ValueError("quantile must be in [0, 1]")
    s = F.col(score) if isinstance(score, str) else score
    scored = docs.withColumn("__score__", s.cast("double"))
    thr = (scored.groupBy(group_col)
           .agg(F.percentile("__score__", F.lit(float(quantile)))
                .alias("__q__"))
           .withColumnRenamed(group_col, "__g__"))
    j = scored.join(F.broadcast(thr),
                    F.col(group_col) == F.col("__g__")).drop("__g__")
    pred = (F.col("__score__") >= F.col("__q__") if keep == "above"
            else F.col("__score__") <= F.col("__q__"))
    return j.filter(pred).drop("__score__", "__q__")


# ---------------------------------------------------------------------------
# Gopher / MassiveText document-quality rules (Rae et al. 2021,
# arXiv:2112.11446, Appendix A.1.1) — the published rule set most
# large-scale pipelines start from. Every rule is a native expression
# (one shuffle-free projection over the corpus); the thresholds are
# parameters so corpora with different token statistics can retune
# without touching the rule definitions.
# ---------------------------------------------------------------------------
GOPHER_DEFAULTS = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_ratio": 0.1,     # '#' and '...' per word
    "max_bullet_ratio": 0.9,     # lines starting with a bullet
    "max_ellipsis_ratio": 0.3,   # lines ending with an ellipsis
    "min_alpha_ratio": 0.8,      # words containing >=1 [A-Za-z]
    "min_stop_hits": 2,          # distinct English stopwords present
}


GOPHER_FIELDS = ("word_count_ok", "mean_word_len_ok", "symbol_ratio_ok",
                 "bullet_ratio_ok", "ellipsis_ratio_ok", "alpha_ratio_ok",
                 "stopword_ok", "gopher_pass")


def gopher_quality_struct(text: Column, **overrides) -> Column:
    """The Gopher rule set as ONE struct Column of boolean flags plus
    ``gopher_pass`` (their conjunction), tokenizing each row exactly
    once. Words are whitespace tokens; lines split on newline; bullets
    are ``-``/``*`` after left-trim; the ellipsis forms are ``...`` and
    ``…``. Identical arithmetic is expressible in ANSI SQL, so the
    whole gate is oracle-checkable.

    The token and line arrays are bound as lambda variables (the
    ``language_id`` one-element-array trick) so every rule shares one
    tokenization — Catalyst's subexpression elimination skips
    lambda-containing expressions, so spelling each rule with its own
    ``split`` copy re-tokenizes per rule AND multiplies plan
    analysis/codegen time. Select the struct once and expand
    (``.select(g.alias("g")).select("g.*")``); per-flag access goes
    through :func:`gopher_quality_flags`.
    """
    from .text import LANG_STOPWORDS, _tokens

    p = {**GOPHER_DEFAULTS, **overrides}
    n_hash = F.length(text) - F.length(F.regexp_replace(text, r"#", ""))
    n_ellipsis = (F.length(text)
                  - F.length(F.regexp_replace(text, r"\.\.\.", ""))) \
        / F.lit(3) \
        + (F.length(text) - F.length(F.regexp_replace(text, "…", "")))
    base = F.struct(
        F.filter(_tokens(text), lambda t: F.length(t) > 0).alias("tk"),
        F.filter(F.split(text, "\n"),
                 lambda ln: F.length(F.trim(ln)) > 0).alias("lines"),
        (n_hash + n_ellipsis).alias("n_symbols"))

    def mk(r: Column) -> Column:
        tk, lines = r["tk"], r["lines"]
        n_words = F.size(tk)
        safe_words = F.greatest(n_words, F.lit(1)).cast("double")
        mean_len = F.aggregate(F.transform(tk, F.length), F.lit(0),
                               lambda a, x: a + x).cast("double") \
            / safe_words
        symbol_ratio = r["n_symbols"].cast("double") / safe_words
        n_lines = F.size(lines)
        safe_lines = F.greatest(n_lines, F.lit(1)).cast("double")
        bullet_ratio = F.size(F.filter(
            lines, lambda ln: F.ltrim(ln).startswith("-")
            | F.ltrim(ln).startswith("*"))).cast("double") / safe_lines
        ellipsis_ratio = F.size(F.filter(
            lines, lambda ln: F.rtrim(ln).endswith("...")
            | F.rtrim(ln).endswith("…"))).cast("double") / safe_lines
        # "contains an ASCII letter" without a per-token regex engine:
        # deleting [a-z] from the lowercased token shortens it iff a
        # letter was present — exactly rlike('[A-Za-z]'), but translate
        # is a charmap pass (the regex was the struct's hottest signal)
        alpha = "abcdefghijklmnopqrstuvwxyz"
        alpha_ratio = F.size(F.filter(
            tk, lambda t: F.length(F.translate(F.lower(t), alpha, ""))
            < F.length(t))).cast("double") / safe_words
        stops = sorted(LANG_STOPWORDS["en"])
        low = F.transform(tk, F.lower)
        stop_hits = F.size(F.filter(
            F.array([F.lit(s) for s in stops]),
            lambda s: F.array_contains(low, s)))

        flags = {
            "word_count_ok": (n_words >= p["min_words"])
            & (n_words <= p["max_words"]),
            "mean_word_len_ok": (mean_len >= p["min_mean_word_len"])
            & (mean_len <= p["max_mean_word_len"]),
            "symbol_ratio_ok": symbol_ratio <= p["max_symbol_ratio"],
            "bullet_ratio_ok": bullet_ratio <= p["max_bullet_ratio"],
            "ellipsis_ratio_ok": ellipsis_ratio <= p["max_ellipsis_ratio"],
            "alpha_ratio_ok": alpha_ratio >= p["min_alpha_ratio"],
            "stopword_ok": stop_hits >= p["min_stop_hits"],
        }
        acc = F.lit(True)
        for c in flags.values():
            acc = acc & c
        flags["gopher_pass"] = acc
        return F.struct(*[flags[k].alias(k) for k in GOPHER_FIELDS])

    return F.get(F.transform(F.array(base), mk), 0)


def gopher_quality_flags(text: Column, **overrides) -> dict[str, Column]:
    """Per-flag view of :func:`gopher_quality_struct` — each entry is
    one field of the struct (one tokenization per selected flag). For
    all-flags projections select the struct itself once and expand."""
    g = gopher_quality_struct(text, **overrides)
    return {k: g[k] for k in GOPHER_FIELDS}


def gopher_quality_filter(df: DataFrame, text_col: str = "text",
                          **overrides) -> DataFrame:
    """Rows passing every Gopher rule — one shuffle-free projection;
    the single ``gopher_pass`` predicate tokenizes each row once."""
    g = gopher_quality_struct(F.col(text_col), **overrides)
    return df.filter(g["gopher_pass"])


def repetition_char_fractions(text: Column, ns: tuple = (2, 3, 4),
                              top_ns: tuple = (2, 3, 4)) -> dict[str, Column]:
    """The CHARACTER-fraction repetition signals of the published
    Gopher rule set (Rae et al. 2021, Appendix A.1.1) — within-document
    rules complementary to :func:`repetition_scores`' count ratios:

    - ``dup_line_frac``: fraction of (non-blank) lines that are exact
      repeats of an earlier line.
    - ``dup_line_char_frac``: fraction of non-blank-line characters
      inside those repeated lines.
    - ``top_{n}gram_char_frac``: characters covered by occurrences of
      the single MOST FREQUENT word n-gram (ties broken by larger
      gram), over total token chars.
    - ``dup_{n}gram_char_frac``: characters covered by n-gram
      occurrences that are repeats (occurrence count − distinct), over
      total token chars — the paper's duplicated-n-gram coverage
      proxy.

    Overlapping occurrences are counted PER OCCURRENCE (each position
    contributes its full gram chars), so on pathologically repetitive
    text the n-gram fractions can exceed 1 — they are repetition
    scores, not exact coverage measures; threshold accordingly. The
    line fractions are true ratios in [0, 1]. All native
    array/aggregate expressions — one shuffle-free projection per
    document; gram char weights assume gram token chars < 1e6 (the
    frequency/chars combined sort key).
    """
    from .text import _clean_tokens

    tk = _clean_tokens(text)
    tok_chars = F.aggregate(F.transform(tk, F.length), F.lit(0),
                            lambda a, x: a + x)
    safe_tok_chars = F.greatest(tok_chars, F.lit(1)).cast("double")

    lines = F.filter(F.split(text, "\n"),
                     lambda ln: F.length(F.trim(ln)) > 0)
    n_lines = F.size(lines)
    safe_lines = F.greatest(n_lines, F.lit(1)).cast("double")
    dup_lines = n_lines - F.size(F.array_distinct(lines))
    line_chars = F.aggregate(F.transform(lines, F.length), F.lit(0),
                             lambda a, x: a + x)
    # chars in repeated occurrences: total line chars - chars of the
    # distinct line set
    dup_line_chars = line_chars - F.aggregate(
        F.transform(F.array_distinct(lines), F.length), F.lit(0),
        lambda a, x: a + x)

    out: dict[str, Column] = {
        "dup_line_frac": dup_lines.cast("double") / safe_lines,
        "dup_line_char_frac": dup_line_chars.cast("double")
        / F.greatest(line_chars, F.lit(1)).cast("double"),
    }

    def gram_strings(n: int) -> Column:
        # bind the token array before the positional lambda — slicing
        # the raw tokenize expression per position would re-split the
        # text O(G) times per row
        def build(tkb: Column) -> Column:
            cnt = F.greatest(F.size(tkb) - (n - 1), F.lit(0))
            return F.when(cnt >= 1, F.transform(
                F.sequence(F.lit(1), cnt),
                lambda i: F.concat_ws(" ", F.slice(tkb, i, n)))) \
                .otherwise(F.array().cast("array<string>"))

        return F.transform(F.array(tk), build)[0]

    def gram_metrics(n: int) -> Column:
        # gram token chars = len(gram) - (n-1) separators, so both
        # passes work off plain string lengths. The gram array binds
        # ONCE per row as a lambda variable; a lambda that referenced
        # the gram-building expression directly would rebuild the
        # whole array per distinct gram — O(G²) array construction
        # that wedges whole-stage codegen at corpus scale.
        def body(ga: Column) -> Column:
            chars = lambda g: F.length(g) - (n - 1)  # noqa: E731
            total = F.aggregate(ga, F.lit(0).cast("long"),
                                lambda a, g: a + chars(g))
            firsts = F.aggregate(F.array_distinct(ga),
                                 F.lit(0).cast("long"),
                                 lambda a, g: a + chars(g))
            # most-frequent gram via a sorted-run fold — O(G log G)
            # instead of a per-distinct-gram rescan. The Gopher rule
            # selects by FREQUENCY (not by coverage), so the fold
            # maximizes the combined key run*1e6 + chars: max count
            # wins, ties break toward the larger gram; coverage is
            # decoded from the winning key.
            init = F.struct(F.lit("").alias("prev"),
                            F.lit(0).cast("long").alias("run"),
                            F.lit(0).cast("long").alias("best"))

            def step(acc: Column, g: Column) -> Column:
                run = F.when(g == acc["prev"], acc["run"] + 1) \
                       .otherwise(F.lit(1).cast("long"))
                # clamp the low digits so a pathological >=1e6-char
                # gram cannot collide into the count field and promote
                # a longer-but-rarer gram; the decoded coverage stays a
                # lower bound for such grams
                key = run * F.lit(1_000_000) \
                    + F.least(chars(g), F.lit(999_999).cast("long"))
                return F.struct(
                    g.alias("prev"), run.alias("run"),
                    F.greatest(acc["best"], key).alias("best"))

            best = F.aggregate(F.array_sort(ga), init, step)["best"]
            # exact decode: subtract the remainder, then divide the
            # exact multiple (no float truncation edge)
            best_chars = F.pmod(best, F.lit(1_000_000))
            top = ((best - best_chars) / F.lit(1_000_000)) \
                .cast("long") * best_chars
            return F.struct(top.alias("top"),
                            (total - firsts).alias("dup"))

        return F.transform(F.array(gram_strings(n)), body)[0]

    # one gram pipeline per distinct n — emitting top and dup from the
    # same struct halves the per-row fold cost when a size appears in
    # both tuples (HOF expressions are not reliably CSE'd by Catalyst)
    for n in sorted(set(top_ns) | set(ns)):
        m = gram_metrics(n)
        if n in top_ns:
            out[f"top_{n}gram_char_frac"] = \
                m["top"].cast("double") / safe_tok_chars
        if n in ns:
            out[f"dup_{n}gram_char_frac"] = \
                m["dup"].cast("double") / safe_tok_chars
    return out


def repetition_char_fractions_grouped(df: DataFrame,
                                      id_col: str = "doc_id",
                                      text_col: str = "text",
                                      n: int = 2) -> DataFrame:
    """Relational form of the n-gram character-coverage metrics:
    (id, tok_chars, top_{n}gram_char_frac, dup_{n}gram_char_frac).

    Same numbers as :func:`repetition_char_fractions` (pytest pins the
    equality) via explode + two map-side-combined aggregates instead
    of per-row array folds — at corpus scale the shuffled/codegen'd
    plan beats the interpreter-bound higher-order functions by ~an
    order of magnitude, so this is the path the suite query and any
    100 TB run should take; the Column version remains for
    shuffle-free moderate-size projections.
    """
    from .text import _clean_tokens

    # project the token array FIRST: a gram lambda that referenced the
    # tokenize expression directly would re-split the text once per
    # gram position (O(G²) tokenization — the bound-variable pitfall).
    # tok_chars folds from the same bound array — no second tokenize
    # pass, no extra shuffle.
    toks = df.select(
        F.col(id_col),
        _clean_tokens(F.col(text_col)).alias("__tk__")) \
        .select(F.col(id_col), F.col("__tk__"),
                F.aggregate(F.transform(F.col("__tk__"), F.length),
                            F.lit(0).cast("long"), lambda a, x: a + x)
                .alias("tok_chars"))
    tkc = F.col("__tk__")
    grams = F.when(F.size(tkc) >= n, F.transform(
        F.sequence(F.lit(1), F.size(tkc) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(tkc, i, n)))) \
        .otherwise(F.array().cast("array<string>"))
    g = (toks.select(F.col(id_col), F.col("tok_chars"),
                     F.explode_outer(grams).alias("g"))
         .groupBy(id_col, "g")
         .agg(F.count("g").alias("cnt"),
              F.first("tok_chars").alias("tok_chars")))
    chars = (F.length("g") - (n - 1)).cast("long")
    # most-frequent-gram selection (the Gopher rule picks by count,
    # ties toward the larger gram) via the same combined key as the
    # Column form: max(cnt*1e6 + chars), coverage decoded after
    # chars clamped below 1e6 so the encoding cannot collide into the
    # count field (coverage decode is a lower bound for such grams)
    key = F.col("cnt") * F.lit(1_000_000) \
        + F.least(chars, F.lit(999_999).cast("long"))
    per_doc = (g.groupBy(id_col).agg(
        F.first("tok_chars").alias("tok_chars"),
        F.coalesce(F.sum(F.col("cnt") * chars), F.lit(0))
        .alias("__total__"),
        F.coalesce(F.sum(chars), F.lit(0)).alias("__firsts__"),
        F.coalesce(F.max(key), F.lit(0)).alias("__best__")))
    best_chars = F.pmod(F.col("__best__"), F.lit(1_000_000))
    top = ((F.col("__best__") - best_chars) / F.lit(1_000_000)) \
        .cast("long") * best_chars
    safe = F.greatest(F.col("tok_chars"), F.lit(1)).cast("double")
    return per_doc.select(
        id_col, "tok_chars",
        (top.cast("double") / safe).alias(f"top_{n}gram_char_frac"),
        ((F.col("__total__") - F.col("__firsts__")).cast("double")
         / safe).alias(f"dup_{n}gram_char_frac"))


# ---------------------------------------------------------------------------
# URL / domain curation (C4 & RefinedWeb-style provenance filtering)
# ---------------------------------------------------------------------------
# Web-corpus pipelines gate documents on WHERE they came from before
# any content signal: drop blocklisted domains (C4 used a ~1M-domain
# badlist), cap per-domain volume (RefinedWeb), and report provenance
# mixes. Everything here is a native projection (parse_url + array
# ops — whole-stage codegen); the blocklist applies as a broadcast
# anti-join keyed by registered domain, so the corpus NEVER shuffles
# for a gate.

# second-level public suffixes for the registered-domain heuristic —
# the common ccTLD families; a full Public Suffix List can be passed
# via extra_suffixes where precision matters
SECOND_LEVEL_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.tw", "com.sg", "co.za", "com.ar",
)


def url_host(url: Column | str) -> Column:
    """Lower-cased host of a URL (native ``parse_url``; NULL when the
    value doesn't parse as a URL — quarantine, don't crash). Trailing
    dots are stripped (an FQDN root label like ``example.com.`` is the
    SAME host — left in place it would make :func:`registered_domain`
    return ``com.`` and let a dotted hostname walk through the domain
    blocklist); an all-dot / empty host normalizes to NULL."""
    u = F.col(url) if isinstance(url, str) else url
    raw = F.lower(F.try_parse_url(u, F.lit("HOST")))
    # conditional strip: the regex only runs on the rare FQDN-root
    # rows instead of every host (round-11 hot-path measurement)
    h = F.when(raw.endswith("."),
               F.regexp_replace(raw, r"\.+$", "")).otherwise(raw)
    return F.when(h == "", F.lit(None).cast("string")).otherwise(h)


# query parameters that carry tracking state, not content identity —
# the standard strip set of crawl-dedup canonicalizers
TRACKING_PARAMS: tuple[str, ...] = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "gclid", "fbclid", "msclkid", "mc_cid", "mc_eid",
    "ref", "referrer",
)


def normalize_url(url: Column | str,
                  strip_params: tuple[str, ...] = TRACKING_PARAMS,
                  sort_query: bool = True) -> Column:
    """Canonical form of a URL — the dedup key for crawl frontiers and
    URL-level exact dedup (two fetches of the same resource must
    canonicalize identically before content ever downloads).

    Native expression chain (``try_parse_url`` + array ops — one
    whole-stage-codegen projection, no UDF, no shuffle):

    - scheme and host lower-cased; trailing host dots stripped;
    - default ports removed (``:80`` for http, ``:443`` for https);
    - fragment dropped;
    - tracking query params (``strip_params``) removed; remaining
      params sorted (``sort_query=True``) so param order doesn't split
      identities; an emptied query drops its ``?``;
    - path defaulting to ``/``, duplicate slashes collapsed, trailing
      slash trimmed off non-root paths.

    Unparseable URLs (no scheme/host) normalize to NULL — quarantine,
    don't crash.
    """
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    host = F.regexp_replace(
        F.lower(F.try_parse_url(u, F.lit("HOST"))), r"\.+$", "")
    # HOST excludes the port; take it from AUTHORITY
    auth = F.lower(F.try_parse_url(u, F.lit("AUTHORITY")))
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    default_port = ((scheme == "http") & (port == "80")) | \
        ((scheme == "https") & (port == "443"))
    port_part = F.when((port == "") | default_port, F.lit("")) \
        .otherwise(F.concat(F.lit(":"), port))

    path = F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.when(path == "", F.lit("/")) \
        .otherwise(F.regexp_replace(path, r"(.)/$", "$1"))

    query = F.try_parse_url(u, F.lit("QUERY"))
    params = F.filter(
        F.split(F.coalesce(query, F.lit("")), "&"),
        lambda p: (p != "") & ~F.lower(
            F.regexp_extract(p, r"^([^=]*)", 1)).isin(
            [s.lower() for s in strip_params]))
    if sort_query:
        params = F.array_sort(params)
    qpart = F.when(F.size(params) > 0,
                   F.concat(F.lit("?"), F.array_join(params, "&"))) \
        .otherwise(F.lit(""))

    ok = scheme.isNotNull() & host.isNotNull() & (host != "")
    return F.when(ok, F.concat(scheme, F.lit("://"), host, port_part,
                               path, qpart))


def registered_domain(host: Column | str,
                      extra_suffixes: tuple[str, ...] = ()
                      ) -> Column:
    """eTLD+1 from a host: the last two labels, or the last three when
    the trailing pair is a known second-level public suffix (co.uk
    etc. — ``SECOND_LEVEL_SUFFIXES`` + ``extra_suffixes``; a heuristic
    subset of the PSL, documented as such). Hosts with ≤ 2 labels pass
    through; NULL stays NULL.

    This is the pure-``Column`` HEURISTIC path (no joins, usable
    inside any projection). The exact Public Suffix List path —
    wildcards, exceptions, longest-match — is
    :func:`detanalysis_spark.llm.psl.registered_domain_psl`, a
    DataFrame transform (chained broadcast joins), and is what
    :func:`domain_blocklist_filter` / :func:`domain_profile` use by
    default."""
    h = F.col(host) if isinstance(host, str) else host
    parts = F.split(h, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2),
                        F.element_at(parts, -1))
    last3 = F.concat_ws(".", F.element_at(parts, -3),
                        F.element_at(parts, -2), F.element_at(parts, -1))
    suffixes = list(SECOND_LEVEL_SUFFIXES) + list(extra_suffixes)
    return (F.when(h.isNull(), F.lit(None).cast("string"))
            .when(n <= 2, h)
            .when(last2.isin(suffixes), last3)
            .otherwise(last2))


def with_registered_domain(df: DataFrame, url_col: str,
                           out_col: str = "registered_domain",
                           host_col: str = "__host__",
                           extra_suffixes: tuple[str, ...] = (),
                           use_psl: bool = True,
                           psl_path: str | None = None) -> DataFrame:
    """Append host (``host_col``) + registered domain (``out_col``).

    Default path is the exact Public Suffix List matcher
    (:func:`detanalysis_spark.llm.psl.registered_domain_psl` — chained
    broadcast joins, corpus never shuffles; resolves the rule list
    via ``psl.psl_source()`` — $DETANALYSIS_PSL_PATH, else the
    vendored complete publicsuffix.org list — unless ``psl_path``
    overrides). ``use_psl=False`` falls back
    to the heuristic :func:`registered_domain` projection.

    When a pipeline applies several provenance gates, call this ONCE
    and pass ``domain_col=out_col`` to each gate — the gates then skip
    rebuilding the matcher plan."""
    work = df.withColumn(host_col, url_host(F.col(url_col)))
    if use_psl:
        from . import psl as _psl
        return _psl.registered_domain_psl(work, host_col,
                                          out_col=out_col,
                                          psl_path=psl_path)
    return work.withColumn(
        out_col, registered_domain(F.col(host_col), extra_suffixes))


def domain_blocklist_filter(df: DataFrame, url_col: str,
                            blocked: DataFrame | list[str],
                            extra_suffixes: tuple[str, ...] = (),
                            use_psl: bool = True,
                            psl_path: str | None = None,
                            domain_col: str | None = None) -> DataFrame:
    """Drop rows whose REGISTERED domain is blocklisted.

    ``blocked`` is a 1-column frame of registered domains or a small
    in-memory list; both run as a broadcast ANTI-JOIN on the domain
    column — the corpus side never shuffles, and NULL domains never
    match, so rows whose URL fails to parse are KEPT (provenance
    gates drop known-bad, not unknown — chain a quarantine filter if
    unparseable means reject). The list path deliberately avoids a
    plain ``isin`` filter: predicate pushdown substitutes the
    computed-domain alias into the pushed filter, re-inlining the
    whole PSL precedence expression per reference — measured 2.4×
    the entire matcher's cost at 500k rows; the join evaluates the
    domain ONCE (see the round-10 probe in STATUS.md).

    Registered domains come from the exact PSL path by default
    (``psl.psl_source()`` resolution; ``psl_path=`` overrides);
    ``use_psl=False`` selects the bounded-suffix heuristic;
    ``domain_col`` names an ALREADY-computed registered-domain column
    (from :func:`with_registered_domain`) to reuse instead.
    """
    cols = df.columns
    if domain_col is not None:
        work, dom = df, F.col(domain_col)
    else:
        work = with_registered_domain(df, url_col, "__dom__",
                                      extra_suffixes=extra_suffixes,
                                      use_psl=use_psl,
                                      psl_path=psl_path)
        dom = F.col("__dom__")
    if isinstance(blocked, list):
        if not blocked:
            return work.select(*cols)
        from .psl import _local_frame as _lf
        bl = _lf(work.sparkSession,
                 [(b.lower(),) for b in blocked], "__blocked_dom__ string")
        return (work.join(F.broadcast(bl),
                          dom == F.col("__blocked_dom__"), "left_anti")
                .select(*cols))
    bl = blocked.select(
        F.lower(F.col(blocked.columns[0])).alias("__blocked_dom__"))
    return (work.join(F.broadcast(bl),
                      dom == F.col("__blocked_dom__"), "left_anti")
            .select(*cols))


def domain_profile(df: DataFrame, url_col: str,
                   extra_suffixes: tuple[str, ...] = (),
                   use_psl: bool = True,
                   psl_path: str | None = None,
                   domain_col: str | None = None,
                   host_col: str | None = None) -> DataFrame:
    """Per-registered-domain corpus profile: docs, share, distinct
    hosts — one map-side-combined aggregate (the thing you read before
    choosing per-domain caps). Unparseable URLs group under NULL.
    Domains via the exact PSL path by default; ``domain_col`` (+
    ``host_col``) reuse precomputed columns (see
    :func:`domain_blocklist_filter`)."""
    if domain_col is not None:
        hc = host_col or "__host__"
        work = df if hc in df.columns else \
            df.withColumn(hc, url_host(F.col(url_col)))
        work = work.select(F.col(hc).alias("__host__"),
                           F.col(domain_col).alias("domain"))
    else:
        work = with_registered_domain(df, url_col, "domain",
                                      extra_suffixes=extra_suffixes,
                                      use_psl=use_psl,
                                      psl_path=psl_path)
    # two-level aggregate instead of count+count_distinct in one: the
    # single-agg plan routes every corpus row through an Expand (2
    # projections per row) to de-duplicate hosts; grouping by (domain,
    # host) first map-side-combines the corpus down to the distinct
    # pairs (bounded by real-world hosts-per-domain), then the second
    # agg is trivial — measured −0.9s at 10M docs (round 11)
    pairs = (work.select("__host__", "domain")
             .groupBy("domain", "__host__")
             .agg(F.count(F.lit(1)).alias("__n__")))
    out = (pairs.groupBy("domain")
           .agg(F.sum("__n__").alias("n_docs"),
                F.count("__host__").alias("n_hosts")))
    # share via a one-row total cross join (broadcast) — NOT a global
    # window, which would single-partition the domain table
    total = out.agg(F.sum("n_docs").alias("__total__"))
    return (out.crossJoin(F.broadcast(total))
            .select("domain", "n_docs", "n_hosts",
                    (F.col("n_docs") / F.col("__total__")).alias("share")))


# ---------------------------------------------------------------------------
# HTML → text extraction (WET-style)
# ---------------------------------------------------------------------------
# Raw crawl payloads are HTML; every text-quality signal downstream
# assumes prose. This is the standard cheap extraction (the WET-file
# transform): drop non-content blocks, strip tags, decode the common
# entities, collapse whitespace — one native regexp_replace chain,
# shuffle-free, whole-stage codegen. It is NOT a DOM parser (no
# readability scoring, no layout awareness); patterns stay in the
# regex subset Java and RE2 share so SQL oracles can replay them.

_HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
    ("&amp;", "&"),          # LAST: &amp;lt; must become &lt;, not <
)


def strip_html(col: Column | str) -> Column:
    """Visible text of an HTML fragment (native expression chain).

    Order matters and is part of the contract: (1) remove
    script/style/comment blocks WITH their contents, (2) break tags
    that imply line structure into spaces, (3) strip remaining tags,
    (4) decode the common entities (&amp; last so double-escapes
    resolve one level, same as a single-pass decoder), (5) collapse
    whitespace runs and trim.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    out = F.regexp_replace(out, r"(?is)<style[^>]*>.*?</style>", " ")
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, r"(?i)<[^>]*>", " ")
    for ent, ch in _HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


# ---------------------------------------------------------------------------
# Unicode hygiene — NFC canonicalization + invisible-character strip
# ---------------------------------------------------------------------------
# Control chars (C0 minus tab/newline/CR, DEL, C1), soft hyphen,
# zero-width family, word joiner, BOM-as-ZWNBSP. Written with
# \\x{...} escapes that parse identically in Java regex (Spark) and
# RE2 (DuckDB) so SQL oracles can replay the exact pattern string.
INVISIBLE_CLASS = ("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F"
                   "\\x{0080}-\\x{009F}\\x{00AD}"
                   "\\x{200B}-\\x{200D}\\x{2060}\\x{FEFF}]")


def strip_invisible(text: Column) -> Column:
    """Remove control / zero-width / soft-hyphen characters — the
    invisible payload real crawls carry (copy-paste artifacts, BOMs
    mid-document, SHY-hyphenated words, zero-width joiners used for
    fingerprinting). Tab/newline/CR survive (they are structure, and
    line-level operators depend on them). Pure native projection;
    the class constant is RE2-compatible so oracles replay it.
    """
    return F.regexp_replace(text, INVISIBLE_CLASS, "")


def nfc_normalize(text: Column) -> Column:
    """Unicode NFC canonicalization as an Arrow-batched pandas UDF
    (canonical composition: ``e + COMBINING ACUTE`` becomes the single
    code point ``\u00e9``) — without it, exact/normalized dedup treats
    canonically-equal crawl texts as distinct and token statistics
    drift between sources that differ only in encoder behavior.

    Python in the row path is unavoidable here (Spark has no native
    normalizer expression) but the kernel is a tight C loop
    (``unicodedata.normalize``) over Arrow batches, embarrassingly
    parallel, no shuffle. NFC (not NFKC) on purpose: canonical
    equivalence only — ligatures/fullwidth forms are CONTENT and
    survive; fold them in a separate explicit step if a pipeline
    wants K-compatibility. DuckDB's ``nfc_normalize`` computes the
    same form, so the operator is fully oracle-checkable.
    """
    # no type hints: PEP-563 stringifies them under this module's
    # `from __future__ import annotations`, which pandas_udf rejects
    @F.pandas_udf("string")
    def _nfc(s):
        import unicodedata
        return s.map(lambda t: unicodedata.normalize("NFC", t)
                     if t is not None else None)

    return _nfc(text)


def fix_mojibake(text: Column) -> Column:
    """Repair the classic crawl mojibake: UTF-8 bytes decoded as
    Latin-1/CP1252 upstream ("caf\u00c3\u00a9" for "caf\u00e9").

    Conservative single-pass rule: re-encode the string as
    Latin-1/CP1252 and, if the bytes decode as STRICT UTF-8 to a
    SHORTER string, take the repair — multi-byte UTF-8 sequences
    mis-decoded always shrink when re-decoded, while plain ASCII and
    genuine Latin-1 text round-trip unchanged or fail strict UTF-8
    and pass through untouched. (A documented heuristic, not full
    ftfy: text that legitimately spells a mojibake byte pattern will
    be "repaired"; at crawl scale that trade is standard.) Arrow-
    batched pandas UDF — no shuffle, embarrassingly parallel; pure
    stdlib codecs.
    """
    # no type hints: PEP-563 stringifies them under this module's
    # `from __future__ import annotations`, which pandas_udf rejects
    @F.pandas_udf("string")
    def _fix(s):
        def one(t):
            if t is None:
                return None
            try:
                # cp1252 first (superset of printable latin-1 in real
                # crawls); fall back to latin-1 for C1 bytes cp1252
                # leaves undefined
                try:
                    b = t.encode("cp1252")
                except UnicodeEncodeError:
                    b = t.encode("latin-1")
                fixed = b.decode("utf-8")
                return fixed if len(fixed) < len(t) else t
            except (UnicodeEncodeError, UnicodeDecodeError):
                return t
        return s.map(one)

    return _fix(text)


# ---------------------------------------------------------------------------
# Luhn-validated payment-card detection — digit-run regexes alone
# drown in false positives (timestamps, ids, phone numbers); the Luhn
# checksum is the standard validation gate (public ISO/IEC 7812), and
# it folds entirely into native expressions: no UDF, no explode.
# ---------------------------------------------------------------------------
# 13-19 digits with optional single space/dash separators between them
CARD_CANDIDATE_PATTERN = r"[0-9](?:[ -]?[0-9]){12,18}"


def luhn_valid(digits: Column) -> Column:
    """True when a pure-digit string passes the Luhn checksum —
    double every second digit from the RIGHT, subtract 9 when the
    double exceeds 9, sum divisible by 10. One native aggregate over
    the char positions (the digit string is bound via reverse so
    position parity is right-anchored)."""
    rev = F.reverse(digits)

    def term(i: Column) -> Column:
        d = rev.substr(i, F.lit(1)).cast("int")
        dbl = d * 2
        return F.when(i % 2 == 0,
                      F.when(dbl > 9, dbl - 9).otherwise(dbl)) \
                .otherwise(d)

    total = F.aggregate(
        F.sequence(F.lit(1), F.length(digits)), F.lit(0),
        lambda acc, i: acc + term(i))
    return (F.length(digits) >= 13) & (total % 10 == 0)


def credit_card_count(text: Column) -> Column:
    """Count of Luhn-VALID payment-card numbers in the text (plain or
    space/dash-separated groups). The candidate regex stays wide and
    the checksum does the precision work — the standard two-stage PII
    card detector, all in whole-stage codegen:
    ``regexp_extract_all → strip separators → Luhn filter → size``.
    Route docs with a nonzero count to quarantine/redaction; a
    separator-format-preserving redact can then target exactly the
    validated matches."""
    cands = F.regexp_extract_all(text, F.lit(CARD_CANDIDATE_PATTERN),
                                 F.lit(0))
    digits = F.transform(
        cands, lambda c: F.regexp_replace(c, "[ -]", ""))
    return F.size(F.filter(digits, luhn_valid))
