"""Sources & sinks: parquet star-schema tables, text directories, csv/json."""

from .files import read_csv, read_json, read_orc, write_csv, write_json, write_orc
from .tables import TABLES, load_table, load_tables, register_views
from .text import read_text_dir, write_text_numbered

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "read_text_dir",
    "write_text_numbered",
    "read_csv",
    "read_orc",
    "write_orc",
    "read_json",
    "write_csv",
    "write_json",
]
