"""isp_trace_parser_spark — a PySpark-native time-series rollup,
downsample, and retention engine with the query surface of
Open-ISP/isp-trace-parser (see README.md and SURVEY.md).

Quick start::

    from isp_trace_parser_spark import get_spark, synth
    from isp_trace_parser_spark.pipeline import ingest_pages, run_rollup_pipeline
    from isp_trace_parser_spark.sources.catalog import Catalog

    spark = get_spark()
    cat = Catalog(spark, "/data/warehouse")
    ingest_pages(cat, synth.pages(spark, n_urls=1000, n_slots=48 * 30))
    run_rollup_pipeline(spark, cat)

Reference-compatible query API::

    from isp_trace_parser_spark.api_compat import get_project_single_reference_year
"""

from isp_trace_parser_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
__all__ = ["get_spark", "__version__"]
