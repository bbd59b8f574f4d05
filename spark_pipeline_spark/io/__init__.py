"""IO layer: declarative sources and sinks (mover parity).

Re-expresses the reference's config-driven read/write dispatchers
(``sparktools/core.py:121-231``) as typed builders over ``spark.read`` /
``DataFrameWriter``. Everything stays a lazy Catalyst plan; the only
driver-side materialization is the explicitly-named ``single_csv`` path.
"""

from spark_pipeline_spark.io.sources import load, read_file, read_jdbc, read_single_csv, read_sql
from spark_pipeline_spark.io.sinks import save, write_file, write_jdbc, write_single_csv, write_table
from spark_pipeline_spark.io.skipping import file_column_stats, skipping_report

__all__ = [
    "load",
    "read_file",
    "read_jdbc",
    "read_single_csv",
    "read_sql",
    "save",
    "write_file",
    "write_jdbc",
    "write_single_csv",
    "write_table",
    "file_column_stats",
    "skipping_report",
]
