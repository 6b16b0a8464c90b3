"""Physical-plan introspection and scale-property assertions."""

from real_estate_bigdata_spark.plans.audit import (  # noqa: F401
    PlanStats,
    assert_plan,
    executed_plan_str,
    plan_stats,
)
