from external_benchmarks_spark.plans.inspect import (  # noqa: F401
    executed_plan,
    optimized_plan,
    plan_has,
)
from external_benchmarks_spark.plans.router import IndexedTable  # noqa: F401
