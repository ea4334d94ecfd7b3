"""Stage catalog: the callable classes/functions meant for
``Dataset.map_batches``.

Stateful stages (callable CLASSES → actor pools; setup once per actor in
__init__):
    EncodeWorker          — partition encode (tokcodec.pipelines.encode)
    LangId                — language ID (tokcodec.functions.text)
    MediaFeatureExtractor — multimodal decode/featurize (functions.multimodal)
    FrameSampler          — video → per-frame row explosion (functions.multimodal)

Stateless stages (plain functions → task pools):
    tokenize, add_token_count, add_quality, add_fingerprint, rolling_hash,
    simhash_batch, minhash_band_rows, batch_stats, payload_meta
"""

from tokcodec.functions.dedup import minhash_band_rows, simhash_batch  # noqa: F401
from tokcodec.functions.multimodal import (  # noqa: F401
    FrameSampler,
    MediaFeatureExtractor,
    payload_meta,
)
from tokcodec.functions.text import (  # noqa: F401
    LangId,
    add_fingerprint,
    add_quality,
    add_token_count,
    rolling_hash,
    tokenize,
)
from tokcodec.pipelines.encode import EncodeWorker  # noqa: F401
from tokcodec.scanner import batch_stats  # noqa: F401
