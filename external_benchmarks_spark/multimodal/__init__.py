from external_benchmarks_spark.multimodal.binaryops import (  # noqa: F401
    blob_metadata,
    mp3_metadata,
    mp4_metadata,
)
