"""Guard: no runtime `import tokcodec...` inside functions of modules
whose code executes in Ray workers.  Workers may receive tokcodec BY
VALUE (cloudpickle registration in __ray_entry__) without the package
being importable, so a lazy internal import inside a worker-executed
function raises ModuleNotFoundError at runtime."""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# modules whose functions run inside map_batches / remote tasks
WORKER_MODULES = [
    "tokcodec/blocks.py",
    "tokcodec/schema.py",
    "tokcodec/scanner.py",
    "tokcodec/projection.py",
    "tokcodec/predicate.py",
    "tokcodec/codecs/bitpack.py",
    "tokcodec/codecs/intcodecs.py",
    "tokcodec/codecs/bytescodecs.py",
    "tokcodec/codecs/fsst.py",
    "tokcodec/codecs/util.py",
    "tokcodec/functions/text.py",
    "tokcodec/functions/dedup.py",
    "tokcodec/functions/ann.py",
    "tokcodec/functions/multimodal.py",
    "tokcodec/functions/hashing.py",
    "tokcodec/functions/joins.py",
    "tokcodec/functions/sketch.py",
]

_LAZY = re.compile(r"^[ \t]+(from tokcodec|import tokcodec)", re.M)


def test_no_runtime_tokcodec_imports_in_worker_modules():
    offenders = []
    for rel in WORKER_MODULES:
        src = open(os.path.join(REPO, rel)).read()
        for m in _LAZY.finditer(src):
            line = src[: m.start()].count("\n") + 1
            offenders.append(f"{rel}:{line}: {m.group().strip()}")
    assert not offenders, (
        "runtime-lazy tokcodec imports break by-value-shipped workers:\n"
        + "\n".join(offenders)
    )
