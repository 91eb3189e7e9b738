from external_benchmarks_spark.sources.registry import (  # noqa: F401
    DatasetSpec,
    read_dataset,
)
