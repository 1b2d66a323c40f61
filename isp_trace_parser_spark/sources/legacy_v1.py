"""Legacy v1 parsed-trace reader.

The reference's v1 layout (superseded by v2, a breaking change —
reference README.md:15-17) stores one parquet per half-year chunk under
``<type>/RefYear<y>/<Project|Zone>/<entity>/
RefYear<y>_<entity>_..._HalfYear<yyyy>-<1|2>.parquet`` with capitalized
``Datetime/Value`` columns (verified against
example_parsed_data/.../RefYear2012_..._HalfYear2053-2.parquet: 8,832
rows = one half-year of half-hours).

This reader lets v1 users migrate: it normalizes the whole directory
tree to the canonical v2-style long schema with metadata columns decoded
from the path, in one distributed read (no per-file driver loop).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_legacy_v1(spark: SparkSession, directory: str) -> DataFrame:
    """Read a v1 parsed-data tree -> canonical
    ``(datetime, value, entity, entity_type, resource_type,
    reference_year)``.

    Two v1 layouts coexist under one ``<type>/RefYear<y>/`` root
    (verified against reference example_parsed_data):

    - ``Project/<project>/<file>.parquet`` — entity is the project
      name, ``resource_type`` is null.
    - ``Area/<zone>/<technology>/<file>.parquet`` — one level deeper:
      entity is the ZONE (parts[-3]), the leaf dir (parts[-2]) is the
      technology / resource quality (e.g. SAT, WH), emitted as
      ``resource_type``; ``entity_type`` is 'zone'.
    """
    if not os.path.exists(directory):
        raise ValueError(f"input directory does not exist: {directory}")
    df = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(directory)
        .withColumn("_path", F.input_file_name())
    )
    parts = F.split(F.col("_path"), "/")
    is_area = F.element_at(parts, -4) == F.lit("Area")
    entity_raw = F.when(is_area, F.element_at(parts, -3)).otherwise(
        F.element_at(parts, -2)
    )
    entity_type = F.when(is_area, F.lit("zone")).otherwise(
        F.lower(F.element_at(parts, -3))  # 'Project' -> 'project'
    )
    resource_type = F.when(is_area, F.element_at(parts, -2))
    ref_year = F.regexp_extract(
        F.element_at(parts, -1), r"^RefYear(\d{4})_", 1
    ).cast("int")
    return df.select(
        F.col("Datetime").alias("datetime"),
        F.col("Value").alias("value"),
        F.regexp_replace(entity_raw, "_", " ").alias("entity"),
        entity_type.alias("entity_type"),
        resource_type.alias("resource_type"),
        ref_year.alias("reference_year"),
    )
