"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference genomics ETL system (Zacharyr41/vcf-pg-loader).

Layers (SURVEY.md §7.0):
  1. relational core  — operators over DataFrames (operators/, queries/)
  2. genomics domain  — VCF scan, decomposition, normalization, QC, PRS
                        (sources/vcf.py, functions/, qc/, prs/)
  3. pipeline layer   — session factory, sinks, views (session.py, plans/)
"""

from vcf_pg_loader_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]

__version__ = "0.1.0"
