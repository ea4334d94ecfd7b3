from tokcodec.pipelines.encode import (  # noqa: F401
    decode_dataset,
    decode_stream,
    encode_dataset,
    encode_stream,
    plan_partitions,
)
from tokcodec.pipelines.compact import compact_blocks, plan_compaction  # noqa: F401
from tokcodec.pipelines.ingest import ingest_documents  # noqa: F401
from tokcodec.pipelines.sidecar import append_columns, read_with_sidecars  # noqa: F401
