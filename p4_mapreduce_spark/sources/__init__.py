"""Source connectors: parquet tables, text directories, binary assets."""

from p4_mapreduce_spark.sources.tables import TABLES, load, load_tables, register_views
from p4_mapreduce_spark.sources.textdir import read_text_dir

__all__ = ["TABLES", "load", "load_tables", "register_views", "read_text_dir"]
