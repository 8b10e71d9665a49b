from .tables import (load_table, load_all, register_views, TABLES,
                     normalize_legacy_columns, LEGACY_COLUMN_MAP,
                     write_bucketed, read_bucketed, write_partitioned,
                     table_diff)
from .files import extract_file_names, load_filterfile
from .textio import (read_wet, write_wet, stream_wet,
                     read_wet_quarantine, read_warc_quarantine,
                     stream_wet_quarantine,
                     read_jsonl, read_jsonl_quarantine, write_jsonl,
                     read_csv_corpus, stream_jsonl_quarantine)
from .hdf5 import (read_vaex_hdf5, hdf5_row_count, hdf5_to_parquet,
                   load_hdf5)
from .wds import write_tar_shards, read_tar_shards, stream_tar_shards
from .layout import (zorder_key, zorder_write, file_manifest,
                     prune_files, pruned_parquet, schema_manifest,
                     schema_drift, compact_parquet_dir)

__all__ = ["load_table", "load_all", "register_views", "TABLES",
           "write_bucketed", "read_bucketed", "write_partitioned",
           "table_diff",
           "normalize_legacy_columns", "LEGACY_COLUMN_MAP",
           "extract_file_names", "load_filterfile",
           "read_jsonl", "read_jsonl_quarantine", "write_jsonl",
           "read_wet", "write_wet", "stream_wet",
           "read_wet_quarantine", "read_warc_quarantine",
           "stream_wet_quarantine",
           "write_tar_shards", "read_tar_shards", "stream_tar_shards",
           "read_csv_corpus", "stream_jsonl_quarantine",
           "read_vaex_hdf5", "hdf5_row_count", "hdf5_to_parquet",
           "load_hdf5",
           "zorder_key", "zorder_write", "file_manifest",
           "prune_files", "pruned_parquet", "schema_manifest", "schema_drift",
           "compact_parquet_dir"]
