from flink_elasticsearch_ingestion_spark.plans.audit import (  # noqa: F401
    assert_no_accidental_quadratic_join,
    assert_no_unpartitioned_fact_window,
    codegen_span_count,
    physical_plan,
    scan_summary,
    unpartitioned_fact_windows,
)
