"""Query suites: importing this package registers every query/oracle
pair with funding_monitoring_spark.registry."""

from funding_monitoring_spark.suites import (  # noqa: F401
    analytics_suite,
    batch_ops,
    behavior_suite,
    container_suite,
    curation_suite,
    dedup_suite,
    graph_suite,
    layout_suite,
    main_dag_suite,
    multimodal_suite,
    olap_suite,
    pipeline_parity,
    reference_core,
    sampling_suite,
    similarity_suite,
    streaming_suite,
    temporal_suite,
    text_suite,
    tpch_suite,
    window_suite,
)
