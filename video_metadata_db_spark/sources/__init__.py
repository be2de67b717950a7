from .datasource import VideoListingDataSource
from .maintenance import compact_parquet, input_bytes
from .tables import TABLES, load_table, load_tables, register_views

__all__ = [
    "TABLES",
    "VideoListingDataSource",
    "compact_parquet",
    "input_bytes",
    "load_table",
    "load_tables",
    "register_views",
]
