"""File-list resolution (S3) and the filter-file side input (S10).

Reference semantics:
- S3: analyzer.py:1061-1100 — resolve dirs/files into a sorted,
  deduplicated file list; ``series`` selects by filename substring
  (``*<series>_*``), or the literal ``"even"``/``"odd"`` prefix
  convention; empty result is an error.
- S10: photon_calibration.py:1316-1323 — a small keyed model table
  (dPdI curve + its uncertainty) loaded once and joined broadcast
  against per-frequency aggregates.

Spark-first notes: file selection happens on the driver before the
scan, so `spark.read.parquet(*files)` only lists the chosen files —
the file-level analog of partition pruning. The filter-file is tiny
(n_samples rows) and always broadcast.
"""

from __future__ import annotations

import os
from glob import glob
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["extract_file_names", "load_filterfile"]


def extract_file_names(paths, series=None,
                       ext: str = ".parquet") -> list[str]:
    """Resolve dirs/files → sorted unique file list with series
    selection (analyzer.py:1061-1100; ext generalized from .hdf5)."""
    if not isinstance(paths, (list, tuple)):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            if series is None:
                out.extend(glob(os.path.join(p, f"*{ext}")))
            elif series in ("even", "odd"):
                out.extend(glob(os.path.join(p, f"{series}_*{ext}")))
            else:
                series_list = (series if isinstance(series, (list, tuple))
                               else [series])
                for s in series_list:
                    out.extend(glob(os.path.join(p, f"*{s}_*{ext}")))
        elif os.path.isfile(p):
            if ext not in p:
                continue
            if series is None:
                out.append(p)
            elif series in ("even", "odd"):
                if series in os.path.basename(p):
                    out.append(p)
            else:
                series_list = (series if isinstance(series, (list, tuple))
                               else [series])
                if any(str(s) in p for s in series_list):
                    out.append(p)
        else:
            raise ValueError(f'File or directory "{p}" does not exist!')
    if not out:
        raise ValueError("no data found — check paths/series arguments")
    return sorted(set(out))


def load_filterfile(spark: SparkSession, path: str, channel: str,
                    tag: str = "dpdi_3poles_default",
                    err_tag: str = "dpdi_err_3poles_default") -> DataFrame:
    """S10: load the dPdI model + error curves for one channel into the
    (freq_index, value_real, value_imag, err_real, err_imag) frame that
    photon.apply_dpdi consumes. Two filters of one tiny table joined on
    the frequency index — always broadcast downstream.
    """
    ff = spark.read.parquet(path).filter(F.col("channel") == channel)
    val = (ff.filter(F.col("tag") == tag)
           .select("freq_index", "value_real", "value_imag"))
    err = (ff.filter(F.col("tag") == err_tag)
           .select("freq_index",
                   F.col("value_real").alias("err_real"),
                   F.col("value_imag").alias("err_imag")))
    return val.join(err, "freq_index")
