"""Storage re-layout: the reference's ``partition_traces_by_columns``
(optimise_parquet.py:21-95) as one declarative Spark write.

The reference enumerates DISTINCT partition values (A2), cross-products
them (A3), and runs one DuckDB COPY per tuple to bound memory
(optimise_parquet.py:32-33,72-93). In Spark that entire loop is a single
plan: shuffle on the partition columns, sort within partitions, write
with partitionBy — the shuffle's spill machinery bounds memory, AQE
right-sizes the shuffle, and every partition writes in parallel instead
of sequentially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from isp_trace_parser_spark.sources.catalog import Catalog


def partition_traces_by_columns(
    spark: SparkSession,
    input_directory: str,
    output_directory: str,
    partition_cols: list[str],
    sort_by: list[str] | None = None,
) -> None:
    """Reference-parity signature (optimise_parquet.py:21-27):
    read a parquet directory, rewrite hive-partitioned by
    ``partition_cols`` with rows sorted by ``sort_by`` inside each
    partition (default ``["datetime"]``)."""
    sort_by = sort_by if sort_by is not None else ["datetime"]
    df = spark.read.parquet(input_directory)
    missing = [c for c in partition_cols if c not in df.columns]
    if missing:
        raise ValueError(f"partition columns not in data: {missing}")
    import os

    cat = Catalog(spark, os.path.dirname(output_directory.rstrip("/")) or ".")
    cat.write(
        df,
        os.path.basename(output_directory.rstrip("/")),
        partition_by=partition_cols,
        sort_within=sort_by,
        mode="overwrite",
    )


def optimise_table(
    df: DataFrame,
    cat: Catalog,
    name: str,
    partition_cols: list[str],
    sort_by: list[str] | None = None,
) -> dict:
    """Catalog-native variant used by the pipeline."""
    return cat.write(
        df,
        name,
        partition_by=partition_cols,
        sort_within=sort_by or ["datetime"],
        mode="overwrite",
    )
