"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in tokcodec) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: columnar encode with
    codec auto-selection (dict/RLE/FSST/bit-pack/FoR) → decode → decoded
    rows.  Returns the decoded Dataset (value-identical to the input)."""
    from tokcodec.pipelines.queries import roundtrip

    return roundtrip("documents", ["doc_id", "text", "lang", "source", "n_chars"])(
        "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 plus
    the training-data extras (dedup / similarity / text / multimodal)."""
    from tokcodec.pipelines.queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (same column
    names as the Ray results).  Non-SQL-expressible ops (round-trip on
    synthesized tokens, LSH/SimHash signatures, heuristic lang-id,
    stubbed multimodal features) are omitted → rows-only check."""
    from tokcodec.pipelines.queries import build_oracle_sql

    return build_oracle_sql()
