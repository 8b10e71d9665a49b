from .tables import load_table, load_all, register_views, TABLES
from .files import extract_file_names, load_filterfile

__all__ = ["load_table", "load_all", "register_views", "TABLES",
           "extract_file_names", "load_filterfile"]
