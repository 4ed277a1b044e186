from .text_csv import read_raw_lines
from .tables import TABLES, load_table, register_views

__all__ = ["read_raw_lines", "TABLES", "load_table", "register_views"]
