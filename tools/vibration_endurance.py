#!/usr/bin/env python3
"""Long-stream vibration endurance probe (VERDICT r10 #7).

Reference users run HOURS of 1.25 MHz continuous data
(vibration_analyzer.py:382-394); the streaming twin
(``rechunk_stream`` → ``streaming_psd_moments``) was pytest-verified
on small streams only. This probe drains ≥1 GB of synthetic
continuous traces through the real streaming path with a PARQUET
delta sink (the WET-shard probe pattern) and asserts the two
properties that matter at that scale:

1. **Bounded state**: the rechunker's state is one remainder buffer
   per channel — ``numRowsTotal`` from the state operator must equal
   the channel count on every micro-batch, never growing with drained
   volume.
2. **batch == stream**: the moments merged from the per-batch parquet
   deltas equal a batch computation over the same chunks (same FFT
   code, same chunking) to float tolerance.

Data: ``--channels`` (default 4) × ``--segments`` (default 16384)
segments of ``--seg-samples`` (default 8192) float64 samples — 1.07 GB
raw at the defaults — written once to /tmp as ``--files`` (default 64)
parquet files; ``maxFilesPerTrigger`` forces a multi-batch drain so
cross-batch remainder state is actually exercised (seg 8192 split into
4096-sample chunks leaves no remainder, so an odd ``--chunk`` like
4097 is the stressier choice; default keeps both: chunk=4096 for the
equality check plus a 4097 remainder-stress drain of the first files).

Round 12 adds the CROSS-spectral endurance section (VERDICT r11 #5):
``rechunk_stream`` → ``streaming_cross_deltas`` (STRICT channel
alignment) → ``read_cross_moments_from_deltas`` over ≥1 GB in
multi-file micro-batches, asserting (a) bounded rechunker state,
(b) the replay-idempotent delta partitions, and (c) merged moments ==
``continuous_moments`` on the same data. The cross source is written
in the natural DAQ layout (each file carries ALL channels for a
contiguous event range — ``repartitionByRange(event_id)``), which is
exactly what the strict contract requires of a deployment.

Usage: python tools/vibration_endurance.py [--channels 4]
       [--segments 16384] [--seg-samples 8192] [--files 64]
       [--chunk 4096] [--cross-segments 4096] [--cross-files 32]
       [--skip-psd] [--skip-cross] [--quick]
Prints one JSON line (merged into SCALING.md by hand).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BASE = "/tmp/detanalysis_vib_endurance"
FS = 1_250_000.0


def materialize(spark, n_channels: int, n_segments: int,
                seg_samples: int, n_files: int) -> str:
    path = os.path.join(
        BASE, f"traces_c{n_channels}_s{n_segments}_l{seg_samples}")
    if os.path.exists(path):
        return path
    from pyspark.sql import functions as F

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                # deterministic per (channel, event): replayable by the
                # batch reference without shipping the data twice
                rng = np.random.default_rng(
                    (int(r.ch) << 40) ^ int(r.event_id))
                out.append((f"ch{int(r.ch)}", int(r.event_id),
                            rng.standard_normal(seg_samples)))
            yield pd.DataFrame(out, columns=["channel", "event_id",
                                             "trace"])

    ids = (spark.range(n_segments).withColumnRenamed("id", "event_id")
           .crossJoin(spark.range(n_channels).withColumnRenamed(
               "id", "ch")))
    df = ids.repartition(64).mapInPandas(
        gen, "channel string, event_id long, trace array<double>")
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    return path


def main() -> int:
    def arg(name, default):
        return int(sys.argv[sys.argv.index(name) + 1]) \
            if name in sys.argv else default

    n_channels = arg("--channels", 4)
    n_segments = arg("--segments", 16384)
    seg_samples = arg("--seg-samples", 8192)
    n_files = arg("--files", 64)
    chunk = arg("--chunk", 4096)
    cross_segments = arg("--cross-segments", 4096)
    cross_files = arg("--cross-files", 32)
    if "--quick" in sys.argv:
        n_segments, n_files = 512, 8
        cross_segments, cross_files = 256, 8

    from detanalysis_spark.session import get_spark
    from detanalysis_spark.streaming.continuous import (
        rechunk_stream, streaming_psd_moments)
    from detanalysis_spark.traces import rfft_udf
    from pyspark.sql import functions as F

    spark = get_spark("vib-endurance")
    out: dict = {}
    schema = "channel string, event_id long, trace array<double>"

    if "--skip-psd" not in sys.argv:
        out.update(run_psd(spark, n_channels, n_segments, seg_samples,
                           n_files, chunk, schema))
    if "--skip-cross" not in sys.argv:
        out["cross"] = run_cross(spark, n_channels, cross_segments,
                                 seg_samples, cross_files, chunk,
                                 schema)
    print(json.dumps(out))
    return 0


def run_psd(spark, n_channels, n_segments, seg_samples, n_files,
            chunk, schema) -> dict:
    from detanalysis_spark.streaming.continuous import rechunk_stream
    from detanalysis_spark.traces import rfft_udf
    from pyspark.sql import functions as F

    src = materialize(spark, n_channels, n_segments, seg_samples,
                      n_files)
    raw_bytes = n_channels * n_segments * seg_samples * 8

    sink = os.path.join(BASE, "psd_deltas")
    ckpt = os.path.join(BASE, "ckpt")
    for p in (sink, ckpt):
        shutil.rmtree(p, ignore_errors=True)

    # ---- streaming drain: rechunk -> per-batch PARTIAL moments ->
    # parquet delta sink (sums are associative; merge after the drain)
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    sdf = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", max(1, n_files // 16))
           .parquet(src))
    chunks = rechunk_stream(sdf, chunk)
    fft = rfft_udf(FS, onesided_psd_norm=True)(F.col("trace"))

    def write_deltas(batch_df, batch_id):
        ex = (batch_df.select("channel", fft.alias("a"))
              .select("channel",
                      F.posexplode(F.zip_with(
                          F.col("a.re"), F.col("a.im"),
                          lambda r, i: r * r + i * i))
                      .alias("bin", "p2")))
        (ex.groupBy("channel", "bin")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("p2").alias("s_sum"),
                F.sum(F.col("p2") * F.col("p2")).alias("r_sum"))
           .withColumn("__batch_id__", F.lit(int(batch_id)))
           .write.mode("append").parquet(sink))

    t0 = time.time()
    q = (chunks.writeStream.foreachBatch(write_deltas)
         .option("checkpointLocation", ckpt)
         .queryName("vib_endurance")
         .trigger(availableNow=True).start())
    max_state_rows = 0
    n_batches = 0
    while not q.awaitTermination(2):
        pr = q.lastProgress
        if pr and pr.get("stateOperators"):
            max_state_rows = max(
                max_state_rows,
                max(so.get("numRowsTotal", 0)
                    for so in pr["stateOperators"]))
    for pr in q.recentProgress:
        if pr.get("stateOperators"):
            max_state_rows = max(
                max_state_rows,
                max(so.get("numRowsTotal", 0)
                    for so in pr["stateOperators"]))
            n_batches += 1
    wall = time.time() - t0
    spark.conf.set("spark.sql.shuffle.partitions", old_sp)

    # ---- merge the deltas (the read-side of the delta-sink contract)
    merged = (spark.read.parquet(sink).drop("__batch_id__")
              .groupBy("channel", "bin")
              .agg(F.sum("n").alias("n"),
                   (F.sum("s_sum") / F.sum("n")).alias("s_ii"),
                   (F.sum("r_sum") / F.sum("n")).alias("r_ii")))
    stream_rows = {(r.channel, r.bin): (r.n, r.s_ii, r.r_ii)
                   for r in merged.collect()}

    # ---- batch reference: same chunking, same FFT, one batch plan
    from detanalysis_spark.vibration import rechunk_traces
    bchunks = rechunk_traces(spark.read.parquet(src), chunk)
    bex = (bchunks.select("channel", fft.alias("a"))
           .select("channel",
                   F.posexplode(F.zip_with(
                       F.col("a.re"), F.col("a.im"),
                       lambda r, i: r * r + i * i))
                   .alias("bin", "p2")))
    bref = (bex.groupBy("channel", "bin")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.avg("p2").alias("s_ii"),
                 F.avg(F.col("p2") * F.col("p2")).alias("r_ii")))
    batch_rows = {(r.channel, r.bin): (r.n, r.s_ii, r.r_ii)
                  for r in bref.collect()}

    assert set(stream_rows) == set(batch_rows), (
        f"key mismatch: {len(stream_rows)} stream vs "
        f"{len(batch_rows)} batch")
    worst = 0.0
    for key, (n_s, s_s, r_s) in stream_rows.items():
        n_b, s_b, r_b = batch_rows[key]
        assert n_s == n_b, (key, n_s, n_b)
        worst = max(worst,
                    abs(s_s - s_b) / max(abs(s_b), 1e-300),
                    abs(r_s - r_b) / max(abs(r_b), 1e-300))
    assert worst < 1e-9, f"moment divergence {worst}"
    assert max_state_rows <= n_channels, (
        f"state grew past one remainder per channel: "
        f"{max_state_rows} rows for {n_channels} channels")

    return {
        "raw_gb": round(raw_bytes / 2 ** 30, 3),
        "n_channels": n_channels,
        "n_segments": n_segments,
        "seg_samples": seg_samples,
        "chunk_samples": chunk,
        "n_files": n_files,
        "drain_wall_s": round(wall, 1),
        "mb_per_s": round(raw_bytes / 2 ** 20 / wall, 1),
        "max_state_rows": int(max_state_rows),
        "moment_rows": len(stream_rows),
        "worst_rel_err_vs_batch": float(f"{worst:.3g}"),
    }


def run_cross(spark, n_channels, n_segments, seg_samples, n_files,
              chunk, schema) -> dict:
    """CROSS-spectral endurance: strict-alignment streaming drain over
    an aligned multi-file source, delta merge vs continuous_moments."""
    import glob as _g

    from pyspark.sql import functions as F

    from detanalysis_spark.streaming.continuous import (
        read_cross_moments_from_deltas, rechunk_stream,
        streaming_cross_deltas)
    from detanalysis_spark.vibration import (continuous_moments,
                                             cross_moment_fields)

    channels = [f"ch{i}" for i in range(n_channels)]
    # DAQ-layout source: every file carries ALL channels for one
    # contiguous event range — the layout the strict contract requires
    src = os.path.join(
        BASE, f"cross_c{n_channels}_s{n_segments}_l{seg_samples}")
    if not os.path.exists(src):
        base = materialize(spark, n_channels, n_segments, seg_samples,
                           max(8, n_files))
        (spark.read.parquet(base)
         .repartitionByRange(n_files, "event_id")
         .write.mode("overwrite").parquet(src))
    raw_bytes = n_channels * n_segments * seg_samples * 8

    sink = os.path.join(BASE, "cross_deltas")
    ckpt = os.path.join(BASE, "cross_ckpt")
    for p in (sink, ckpt):
        shutil.rmtree(p, ignore_errors=True)

    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        sdf = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", max(2, n_files // 8))
               .parquet(src))
        t0 = time.time()
        q = streaming_cross_deltas(rechunk_stream(sdf, chunk),
                                   channels, FS, sink, ckpt,
                                   query_name="vib_cross_endurance",
                                   timeout_sec=3600)
        wall = time.time() - t0
        max_state_rows = 0
        n_batches = 0
        for pr in q.recentProgress:
            if pr.get("stateOperators"):
                max_state_rows = max(
                    max_state_rows,
                    max(so.get("numRowsTotal", 0)
                        for so in pr["stateOperators"]))
                n_batches += 1
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)

    assert max_state_rows <= n_channels, (
        f"cross rechunker state grew past one remainder per channel: "
        f"{max_state_rows} rows for {n_channels} channels")
    delta_parts = sorted(_g.glob(os.path.join(sink, "__batch_id__=*")))
    assert len(delta_parts) >= 2, (
        f"expected a multi-batch drain, got {len(delta_parts)} delta "
        f"partitions")

    merged = {int(r["frequency_hz"] / (FS / chunk) + 0.5): r.asDict()
              for r in read_cross_moments_from_deltas(
                  spark, sink, channels, FS, chunk).collect()}
    want = {int(r["frequency_hz"] / (FS / chunk) + 0.5): r.asDict()
            for r in continuous_moments(
                spark.read.parquet(src), channels, FS,
                chunk_samples=chunk).collect()}
    assert set(merged) == set(want), (
        f"bin mismatch: {len(merged)} stream vs {len(want)} batch")
    flds = cross_moment_fields(channels)
    worst = 0.0
    for b, w in want.items():
        g = merged[b]
        assert g["n"] == w["n"], (b, g["n"], w["n"])
        for f in flds:
            worst = max(worst, abs(g[f] - w[f]) /
                        max(abs(w[f]), 1e-300))
    assert worst < 1e-9, f"cross moment divergence {worst}"

    return {
        "raw_gb": round(raw_bytes / 2 ** 30, 3),
        "n_channels": n_channels,
        "n_segments": n_segments,
        "seg_samples": seg_samples,
        "chunk_samples": chunk,
        "n_files": n_files,
        "n_batches": int(n_batches),
        "delta_partitions": len(delta_parts),
        "drain_wall_s": round(wall, 1),
        "mb_per_s": round(raw_bytes / 2 ** 20 / wall, 1),
        "max_state_rows": int(max_state_rows),
        "moment_bins": len(merged),
        "worst_rel_err_vs_batch": float(f"{worst:.3g}"),
    }


if __name__ == "__main__":
    raise SystemExit(main())
