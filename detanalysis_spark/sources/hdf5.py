"""HDF5 → Parquet ingestion (the reference's native on-disk format).

Reference semantics: detanalysis loads columnar vaex-layout HDF5 —
datasets at ``/table/columns/<col>/data`` (analyzer.py:560
``vx.open_many``; SURVEY §1.1, confirmed against ``demos/
features.hdf5``) — or, with ``load_from_pandas``, pandas-HDFStore
files keyed ``detprocess_df`` (analyzer.py:550-558). A real
detanalysis user therefore arrives with HDF5; this module converts it
once into the engine's partitioned Parquet, after which every query
runs on the columnar scan path (predicate pushdown, column pruning).

Spark-first shape: conversion is embarrassingly parallel BY FILE, so
the file list is distributed with ``sc.parallelize(files, n_files)``
and each task converts its file with h5py + pyarrow — no row ever
passes through the driver, and a 100 TB ingest scales with executor
count. The permanent ``__event_index__`` is assigned per file from
precomputed offsets (one metadata-only pass collects per-file row
counts, the same two-pass pattern as ``ensure_event_index``), so ids
are globally dense and file-order stable without any global sort.

h5py is optional: when importable it is preferred (C-speed reads,
full format coverage); otherwise the vendored pure-stdlib
``minihdf5`` reader/writer handles the vaex columnar subset
(superblock 0/2, v1/v2 object headers, symbol-table and compact-link
groups, contiguous datasets — verified against the reference's own
``demos/features.hdf5``), so ingestion works in hermetic
environments too. vaex string columns (``data`` bytes + ``indices``
offsets, the layout ``features.hdf5`` uses for ``group_name`` etc.)
are decoded in either backend.
"""

from __future__ import annotations

import os
import re
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from .files import extract_file_names

__all__ = ["read_vaex_hdf5", "hdf5_row_count", "hdf5_to_parquet",
           "load_hdf5", "read_trace_hdf5", "trace_hdf5_to_parquet",
           "load_trace_hdf5"]

EVENT_INDEX = "__event_index__"


def _require_h5py():
    """h5py when importable (C-speed, full format), else the vendored
    pure-stdlib reader for the vaex columnar subset."""
    try:
        import h5py  # noqa: F401
        return h5py
    except ImportError:  # pragma: no cover - env-dependent
        from . import minihdf5
        return minihdf5


def _column_names(h5file) -> list[str]:
    if "table" not in h5file or "columns" not in h5file["table"]:
        raise ValueError(
            "not a vaex-layout HDF5 file (expected /table/columns/"
            "<col>/data groups)")
    return sorted(h5file["table"]["columns"].keys())


def hdf5_row_count(path: str) -> int:
    """Rows in one vaex-layout file — metadata only (no data read).

    String columns store a flat byte buffer in ``data`` plus ``n+1``
    offsets in ``indices``; their logical row count is
    ``len(indices) - 1``, not the buffer length.
    """
    h5py = _require_h5py()
    with h5py.File(path, "r") as f:
        cols = _column_names(f)
        g = f["table"]["columns"][cols[0]]
        if "indices" in g:
            return int(g["indices"].shape[0]) - 1
        return int(g["data"].shape[0])


def read_vaex_hdf5(path: str, columns: Sequence[str] | None = None):
    """One vaex-layout HDF5 file → ``pyarrow.Table`` (column-pruned
    when ``columns`` is given). vaex string columns (flat ``data``
    byte buffer + ``n+1`` ``indices`` offsets — the layout the
    reference's ``demos/features.hdf5`` uses for ``group_name``/
    ``processing_id``) and plain fixed-length bytes datasets both
    decode as UTF-8 strings; everything else keeps its numpy dtype."""
    h5py = _require_h5py()
    import numpy as np
    import pyarrow as pa

    with h5py.File(path, "r") as f:
        names = _column_names(f)
        if columns is not None:
            missing = set(columns) - set(names)
            if missing:
                raise ValueError(f"columns not in {path}: "
                                 f"{sorted(missing)}")
            names = [c for c in names if c in set(columns)]
        arrays, fields = [], []
        for c in names:
            g = f["table"]["columns"][c]
            if "indices" in g:
                buf = np.asarray(g["data"][:]).tobytes()
                idx = np.asarray(g["indices"][:], dtype=np.int64)
                data = np.array([buf[idx[i]:idx[i + 1]].decode("utf-8")
                                 for i in range(len(idx) - 1)])
            else:
                data = g["data"][:]
                if data.dtype.kind in ("S", "O"):
                    data = np.array(
                        [v.decode("utf-8") if isinstance(v, bytes)
                         else str(v) for v in data])
            arr = pa.array(data)
            arrays.append(arr)
            fields.append(pa.field(c, arr.type))
        return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


def _convert_one(path: str, out_dir: str, offset: int | None,
                 columns: Sequence[str] | None,
                 compression: str) -> str:
    """Convert one file (runs on an executor). Returns the output path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = read_vaex_hdf5(path, columns)
    if offset is not None:
        import numpy as np
        idx = pa.array(np.arange(offset, offset + table.num_rows,
                                 dtype=np.int64))
        table = table.append_column(
            pa.field(EVENT_INDEX, pa.int64()), idx)
    base = os.path.splitext(os.path.basename(path))[0]
    out_path = os.path.join(out_dir, f"{base}.parquet")
    pq.write_table(table, out_path, compression=compression)
    return out_path


def hdf5_to_parquet(spark: SparkSession, paths, out_dir: str,
                    series=None, columns: Sequence[str] | None = None,
                    assign_event_index: bool = True,
                    compression: str = "snappy") -> list[str]:
    """Convert vaex-layout HDF5 file(s)/dir(s) → one Parquet file each
    under ``out_dir``; returns the sorted output paths.

    Two passes: (1) driver-side metadata pass reads per-file row
    counts and computes dense ``__event_index__`` offsets in sorted
    file order — matching ``np.arange(len(df))`` over the
    ``open_many`` concatenation (reference analyzer.py:563-565);
    (2) the conversion itself fans out one Spark task per file.
    """
    _require_h5py()
    files = extract_file_names(paths, series=series, ext=".hdf5")
    offsets = _plan_offsets(files) if assign_event_index \
        else [None] * len(files)
    return _convert_files(spark, list(zip(files, offsets)), out_dir,
                          columns, compression)


def _plan_offsets(files: list[str]) -> list:
    """Dense ``__event_index__`` start offset per file, in sorted file
    order (metadata-only pass)."""
    acc, offsets = 0, []
    for p in files:
        offsets.append(acc)
        acc += hdf5_row_count(p)
    return offsets


def _convert_files(spark: SparkSession, work: list, out_dir: str,
                   columns, compression) -> list[str]:
    os.makedirs(out_dir, exist_ok=True)
    sc = spark.sparkContext
    out = (sc.parallelize(work, len(work))
           .map(lambda fo: _convert_one(fo[0], out_dir, fo[1],
                                        columns, compression))
           .collect())
    return sorted(out)



# ----------------------------------------------------------------------
# generic events-as-datasets trace layout → trace parquet schema
# ----------------------------------------------------------------------
# The reference fetches raw waveforms from instrument HDF5 through
# pytesio's ``H5Reader.read_many_events``
# (/root/reference/detanalysis/analyzer.py:1030-1046) — an
# instrument-specific raw format. The public-knowledge shape of such
# files is "events as datasets": each event's waveform is its own
# numeric dataset, grouped by channel (``/<channel>/event_<N>`` 1-D)
# or stored as one ``(n_chan, n_samp)`` 2-D dataset per event. This
# walker ingests ANY file of that family into the engine's trace
# parquet schema (``series_number long, event_number long, channel
# string, trace array<double>`` — the table every S7/S8/J2 fetch and
# F-arr kernel reads), after which raw access is a broadcast key join
# instead of a driver-side file read.
#
# Conventions (documented, deterministic):
# - event_number: the trailing integer in the dataset name
#   (``event_42`` → 42); datasets without one enumerate in walk order
#   per channel.
# - channel (1-D datasets): the innermost enclosing group name, or
#   ``ch0`` for root-level datasets. (2-D datasets): the ``channels``
#   argument, else ``ch0..ch{n-1}``.
# - series_number: ``series_number`` argument, else the trailing
#   integer in the file basename, else the file's position in the
#   sorted file list.
_TRAILING_INT = re.compile(r"(\d+)\s*$")


def _walk_datasets(group, prefix: str = ""):
    """Yield ``(path, dataset)`` for every dataset under ``group``
    (both h5py and minihdf5 expose ``keys`` on groups only)."""
    for name in sorted(group.keys()):
        node = group[name]
        if hasattr(node, "keys"):
            yield from _walk_datasets(node, f"{prefix}{name}/")
        else:
            yield prefix + name, node


def read_trace_hdf5(path: str, channels: Sequence[str] | None = None,
                    series_number: int | None = None):
    """One events-as-datasets HDF5 file → ``pyarrow.Table`` in the
    trace parquet schema. Non-numeric and >2-D datasets are skipped;
    vaex-layout files are rejected (use :func:`read_vaex_hdf5`)."""
    h5py = _require_h5py()
    import numpy as np
    import pyarrow as pa

    if series_number is None:
        m = _TRAILING_INT.search(
            os.path.splitext(os.path.basename(path))[0])
        series_number = int(m.group(1)) if m else 0

    series, events, chans, traces = [], [], [], []
    seq: dict[str, int] = {}

    def emit(evt, chan, arr):
        series.append(int(series_number))
        events.append(int(evt))
        chans.append(str(chan))
        traces.append(np.asarray(arr, dtype=np.float64))

    def next_seq(chan) -> int:
        seq[chan] = seq.get(chan, -1) + 1
        return seq[chan]

    with h5py.File(path, "r") as f:
        if "table" in f and "columns" in f["table"]:
            raise ValueError(
                f"{path} is a vaex-layout file — use read_vaex_hdf5 / "
                "hdf5_to_parquet for feature tables")
        for dpath, ds in _walk_datasets(f):
            dtype = np.dtype(ds.dtype)
            if dtype.kind not in "iuf":
                continue
            parts = dpath.split("/")
            m = _TRAILING_INT.search(parts[-1])
            shape = tuple(ds.shape)
            if len(shape) == 1:
                chan = parts[-2] if len(parts) > 1 else "ch0"
                evt = int(m.group(1)) if m else next_seq(chan)
                emit(evt, chan, ds[:])
            elif len(shape) == 2:
                evt = int(m.group(1)) if m else next_seq("__2d__")
                data = ds[:]
                for i in range(shape[0]):
                    chan = channels[i] if channels is not None \
                        and i < len(channels) else f"ch{i}"
                    emit(evt, chan, data[i])
            # >2-D: not a trace family this walker claims; skip

    return pa.Table.from_arrays(
        [pa.array(series, pa.int64()), pa.array(events, pa.int64()),
         pa.array(chans, pa.string()),
         pa.array([t.tolist() for t in traces],
                  pa.list_(pa.float64()))],
        names=["series_number", "event_number", "channel", "trace"])


def _convert_one_trace(path: str, out_dir: str, channels,
                       series_number, compression: str) -> str:
    import pyarrow.parquet as pq

    table = read_trace_hdf5(path, channels=channels,
                            series_number=series_number)
    base = os.path.splitext(os.path.basename(path))[0]
    out_path = os.path.join(out_dir, f"{base}.parquet")
    pq.write_table(table, out_path, compression=compression)
    return out_path


def trace_hdf5_to_parquet(spark: SparkSession, paths, out_dir: str,
                          series=None,
                          channels: Sequence[str] | None = None,
                          compression: str = "snappy",
                          fallback_index: dict[str, int] | None = None
                          ) -> list[str]:
    """Convert events-as-datasets HDF5 file(s)/dir(s) → one trace
    parquet file each under ``out_dir``; returns sorted output paths.

    Fans out one Spark task per file (embarrassingly parallel — no
    waveform touches the driver). Files without a trailing integer in
    their basename get their sorted-list position as series_number,
    keeping (series_number, event_number) keys unique across files.
    ``fallback_index`` overrides that position per path — callers
    converting a SUBSET (incremental reconversion) pass positions from
    the full sorted file list so series numbers stay stable across
    partial runs instead of being renumbered 0..len(subset)-1.
    """
    _require_h5py()
    files = extract_file_names(paths, series=series, ext=".hdf5")
    os.makedirs(out_dir, exist_ok=True)
    work = []
    for i, p in enumerate(files):
        base = os.path.splitext(os.path.basename(p))[0]
        m = _TRAILING_INT.search(base)
        pos = (fallback_index or {}).get(p, i)
        work.append((p, int(m.group(1)) if m else pos))
    sc = spark.sparkContext
    out = (sc.parallelize(work, len(work))
           .map(lambda ps: _convert_one_trace(ps[0], out_dir, channels,
                                              ps[1], compression))
           .collect())
    return sorted(out)


def load_trace_hdf5(spark: SparkSession, paths, out_dir: str,
                    series=None,
                    channels: Sequence[str] | None = None) -> DataFrame:
    """One-call convenience: convert stale/missing twins, then open the
    trace table parquet (same mtime-twin rule as :func:`load_hdf5`).

    Reconverting a stale SUBSET keeps series numbers stable: the
    positional fallback for basenames without a trailing integer is
    the file's index in the FULL sorted list (passed through
    ``fallback_index``), not its index within the stale subset — so
    (series_number, event_number) keys never shift or collide across
    incremental runs."""
    _require_h5py()
    files = extract_file_names(paths, series=series, ext=".hdf5")
    positions = {p: i for i, p in enumerate(files)}
    twins = [os.path.join(out_dir,
                          os.path.splitext(os.path.basename(p))[0]
                          + ".parquet")
             for p in files]
    stale = [p for p, twin in zip(files, twins)
             if not os.path.exists(twin)
             or os.path.getmtime(twin) < os.path.getmtime(p)]
    if stale:
        trace_hdf5_to_parquet(spark, stale, out_dir, channels=channels,
                              fallback_index=positions)
    return spark.read.parquet(*twins)


def load_hdf5(spark: SparkSession, paths, out_dir: str, series=None,
              columns: Sequence[str] | None = None) -> DataFrame:
    """One-call convenience: convert (if needed) then open the Parquet.

    Conversion is skipped for files whose up-to-date Parquet twin
    already exists in ``out_dir`` (mtime-checked), so repeated loads
    pay only the scan. ``__event_index__`` offsets are planned over
    the FULL sorted file list (not just the stale subset), so ids
    stay globally dense and stable across incremental conversions —
    provided new files sort AFTER already-converted ones (true for
    the reference's timestamped series naming); files inserted
    mid-order need a fresh ``hdf5_to_parquet`` run of the whole set.
    """
    _require_h5py()
    files = extract_file_names(paths, series=series, ext=".hdf5")
    offsets = _plan_offsets(files)
    twins = [os.path.join(out_dir,
                          os.path.splitext(os.path.basename(p))[0]
                          + ".parquet")
             for p in files]
    stale = [(p, off) for p, off, twin in zip(files, offsets, twins)
             if not os.path.exists(twin)
             or os.path.getmtime(twin) < os.path.getmtime(p)]
    if stale:
        _convert_files(spark, stale, out_dir, columns, "snappy")
    return spark.read.parquet(*twins)
