"""AEMO-style wide-CSV trace source with a declared (never inferred)
schema — reference S1/S2 (trace_restructure_helper_functions.py:10-20).

The reference forces ``[Int64]*3 + [Float64]*48`` at read; we declare the
same schema to Spark so the scan is single-pass (no inference job) and
type-stable. Recursive discovery uses Spark's own glob/recursive lookup
instead of driver-side rglob — at scale the driver must never enumerate
files itself.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

# the one canonical resource-trace filename pattern
# (<stem>_RefYear<year>.csv) — shared by the column decode, the
# listing-based stem validation (parse.py) and the touched-partition
# derivation, so they can never drift apart
STEM_RE = r"^(.*)_RefYear(\d{4})\.csv$"


def wide_trace_schema(padded: bool = True) -> StructType:
    labels = [f"{i:02d}" if padded else str(i) for i in range(1, 49)]
    return StructType(
        [
            StructField("Year", LongType()),
            StructField("Month", LongType()),
            StructField("Day", LongType()),
            *[StructField(lab, DoubleType()) for lab in labels],
        ]
    )


def read_wide_trace_csvs(
    spark: SparkSession, directory: str, padded: bool = True
) -> DataFrame:
    """Read every ``*.csv`` under ``directory`` (recursive) with the
    declared schema, tagging each row with its source file (the
    reference's filename->metadata decode, resource_trace_metadata.py:20-44,
    becomes a real column here)."""
    if not os.path.exists(directory):
        # fail loud like the reference (helper_functions.py:12-14)
        raise ValueError(f"input directory does not exist: {directory}")
    df = (
        spark.read.schema(wide_trace_schema(padded))
        .option("header", "true")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.csv")
        .csv(directory)
    )
    return df.withColumn("source_file", F.input_file_name())


def decode_trace_filename(df: DataFrame, col: str = "source_file") -> DataFrame:
    """Filename -> (trace_stem, reference_year) columns.

    Reference splits ``<stem>_RefYear<year>.csv`` via rpartition
    (resource_trace_metadata.py:20-31); here a regexp on the path. Rows
    that don't match keep NULLs — callers decide whether to fail loud
    (the reference raises ValueError on unknown stems; we surface them
    via an ``unknown`` filter so the check is distributed, not
    driver-side).
    """
    base = F.element_at(F.split(F.col(col), "/"), -1)
    return df.withColumn(
        "trace_stem", F.regexp_extract(base, STEM_RE, 1)
    ).withColumn(
        "reference_year",
        F.nullif(F.regexp_extract(base, STEM_RE, 2), F.lit("")).cast(
            "int"
        ),
    )
