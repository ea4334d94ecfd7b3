"""Full-lifecycle integration: the cross-module path a real corpus
takes — ingest (jsonl → tokenized TOKB) → sidecar column append →
predicate reads over base+sidecar → compaction (with blooms) → sidecar
rebuild on the compacted layout → bloom point lookup.  Each module is
unit-tested on its own; this test pins the INTERACTIONS: sidecar dirs
stay invisible to base-dir manifest scans, compaction preserves row
content while renaming blocks (so sidecars must and do rebuild), and
the same logical query answers identically at every stage.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pytest

from tokcodec import manifest as mf
from tokcodec.functions.text import tokenize
from tokcodec.pipelines import append_columns, read_with_sidecars
from tokcodec.pipelines.compact import compact_blocks
from tokcodec.pipelines.encode import count_prunable_blocks, decode_dataset
from tokcodec.pipelines.ingest import ingest_documents
from tokcodec.predicate import col

N_DOCS = 120
WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


def _corpus() -> list[dict]:
    # deterministic, skewed lengths (i^2 mod pattern) and mixed sources
    docs = []
    for i in range(N_DOCS):
        n = 1 + (i * i) % 17
        text = " ".join(WORDS[(i + j) % len(WORDS)] for j in range(n))
        docs.append(
            {"doc_id": f"doc{i:04d}", "text": text, "source": "web" if i % 3 else "book"}
        )
    return docs


def _quality_fn():
    # nested so cloudpickle ships it by value (tests aren't importable
    # on Ray workers)
    def _q(t):
        import pyarrow as _pa
        import pyarrow.compute as _pc

        ntok = t.column("n_tok").combine_chunks()
        return _pa.table(
            {
                "q_score": _pc.multiply(ntok.cast(_pa.int64()), 7),
                "q_long": _pc.greater(ntok, 8),
            }
        )

    return _q


@pytest.fixture(scope="module")
def lifecycle_dirs(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("lifecycle")
    docs = _corpus()
    shards = []
    for s in range(6):  # several read tasks → several sink blocks
        p = root / f"docs-{s}.jsonl"
        part = docs[s::6]
        p.write_text("\n".join(json.dumps(d) for d in part) + "\n")
        shards.append(str(p))
    base = str(root / "base")
    res = ingest_documents(shards, base, fmt="jsonl")
    assert res["rows"] == N_DOCS
    return shards, base, str(root / "compacted")


def _expected() -> pa.Table:
    docs = _corpus()
    t = pa.table(
        {
            "doc_id": [d["doc_id"] for d in docs],
            "text": [d["text"] for d in docs],
            "source": [d["source"] for d in docs],
        }
    )
    return tokenize(t)


def test_ingest_then_sidecar_predicate_read(lifecycle_dirs, ray_session):
    _src, base, _cdir = lifecycle_dirs
    res = append_columns(base, "quality", _quality_fn(), input_columns=["n_tok"])
    assert res["blocks"] + res["skipped"] == len(mf.list_manifests(base))

    # sidecar subdir must stay invisible to the base dir's manifest scan
    n_base = len(mf.list_manifests(base))
    got = read_with_sidecars(
        base, ["quality"], columns=["doc_id", "n_tok", "q_score"],
        predicate=col("q_long") == True,  # noqa: E712
    ).to_pandas()
    assert len(mf.list_manifests(base)) == n_base

    exp = _expected().to_pandas()
    exp_ids = set(exp.loc[exp["n_tok"] > 8, "doc_id"])
    assert set(got["doc_id"]) == exp_ids
    assert (got["q_score"] == got["n_tok"] * 7).all()


def test_compaction_preserves_content_and_invalidates_sidecars(
    lifecycle_dirs, ray_session
):
    _src, base, cdir = lifecycle_dirs
    # sink manifests carry row masses (no n_tok), so the target is in
    # rows here: 6×20-row blocks at target 45 → 3 merged buckets
    res = compact_blocks(base, cdir, target_tokens=45, bloom_cols=["doc_id"])
    n_base = len(mf.list_manifests(base))
    assert 2 <= res["buckets"] < n_base

    before = decode_dataset(base).to_pandas().sort_values("doc_id").reset_index(drop=True)
    after = decode_dataset(cdir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert before["doc_id"].tolist() == after["doc_id"].tolist()
    assert all(list(a) == list(b) for a, b in zip(before["tokens"], after["tokens"]))

    # the compacted layout renamed blocks: the old sidecar can't attach
    with pytest.raises(ValueError, match="missing"):
        read_with_sidecars(cdir, ["quality"]).to_pandas()

    # rebuild on the compacted dir; the joined answer is unchanged
    append_columns(cdir, "quality", _quality_fn(), input_columns=["n_tok"])
    got = read_with_sidecars(
        cdir, ["quality"], columns=["doc_id", "q_score"],
        predicate=col("q_long") == True,  # noqa: E712
    ).to_pandas()
    exp = _expected().to_pandas()
    exp_ids = set(exp.loc[exp["n_tok"] > 8, "doc_id"])
    assert set(got["doc_id"]) == exp_ids


def test_bloom_point_lookup_on_compacted(lifecycle_dirs, ray_session):
    _src, _base, cdir = lifecycle_dirs
    nblocks = len([m for m in mf.list_manifests(cdir) if "members" in m])
    if nblocks < 2:
        pytest.skip("corpus compacted into a single block; nothing to prune")
    skip, total = count_prunable_blocks(cdir, col("doc_id") == "doc0042")
    assert total == nblocks and skip >= total - 2  # FP allowance
    got = decode_dataset(cdir, predicate=col("doc_id") == "doc0042").to_pandas()
    assert got["doc_id"].tolist() == ["doc0042"]

    skip2, _ = count_prunable_blocks(cdir, col("doc_id") == "absent")
    assert skip2 == total
