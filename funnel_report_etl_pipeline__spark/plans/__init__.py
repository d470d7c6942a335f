from funnel_report_etl_pipeline__spark.plans.registry import REGISTRY, QuerySpec, register

__all__ = ["REGISTRY", "QuerySpec", "register"]
