"""Document / embedding corpus sources (training-data pipeline inputs).

Plain parquet loads of the driver-provided tables; at production scale
these would be Iceberg table scans — the query code is identical either
way (DataFrame in, DataFrame out), column pruning and predicate pushdown
reach the scan in both cases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def documents_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def embeddings_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")
