from .tables import load_table, load_all, register_views, TABLES

__all__ = ["load_table", "load_all", "register_views", "TABLES"]
