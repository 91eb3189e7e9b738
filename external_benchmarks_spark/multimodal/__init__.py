from external_benchmarks_spark.multimodal.binaryops import (  # noqa: F401
    blob_metadata,
    decode_image_stub,
    frame_sample_stub,
)
