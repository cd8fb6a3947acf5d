from flink_elasticsearch_ingestion_spark.plans.audit import (  # noqa: F401
    assert_no_accidental_quadratic_join,
    codegen_span_count,
    physical_plan,
    scan_summary,
)
