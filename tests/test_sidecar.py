"""Sidecar column append: computed columns attach to an encoded corpus
without rewriting base blocks — aligned, resumable, stale-safe."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from tokcodec.pipelines import append_columns, encode_dataset, read_with_sidecars
from tokcodec.pipelines.sidecar import _sidecar_dir


@pytest.fixture(scope="module")
def enc(ray_session, fixture_parquet, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sc_enc"))
    encode_dataset(fixture_parquet, out, target_tokens=1_000_000)
    return out


def _make_stats_fn():
    # nested so cloudpickle serializes it by VALUE — the tests package
    # is not importable on Ray workers
    def _tok_stats(t):
        import pyarrow as _pa
        import pyarrow.compute as _pc

        return _pa.table(
            {
                "tok_len": _pc.list_value_length(t.column("tokens")).cast(_pa.int64()),
                "even_ntok": _pc.equal(_pc.bit_wise_and(t.column("n_tok"), 1), 0),
            }
        )

    return _tok_stats


def test_append_and_read_back_aligned(enc, ray_session):
    res = append_columns(enc, "stats", _make_stats_fn(), input_columns=["tokens", "n_tok"])
    assert res["blocks"] >= 2 and res["skipped"] == 0

    ds = read_with_sidecars(enc, ["stats"])
    got = ds.to_pandas()
    # alignment: the sidecar column must equal recomputing from the base
    assert (got["tok_len"] == got["tokens"].map(len)).all()
    assert (got["even_ntok"] == (got["n_tok"] % 2 == 0)).all()


def test_append_is_resumable(enc, ray_session):
    res2 = append_columns(enc, "stats", _make_stats_fn(), input_columns=["tokens", "n_tok"])
    assert res2["blocks"] == 0 and res2["skipped"] >= 2


def test_column_selection_skips_payloads(enc, ray_session):
    # sidecar-only selection must not decode base payloads; base-only
    # selection must not require the sidecar columns
    only_side = read_with_sidecars(enc, ["stats"], columns=["tok_len"]).to_pandas()
    assert list(only_side.columns) == ["tok_len"]
    mixed = read_with_sidecars(enc, ["stats"], columns=["doc_id", "tok_len"]).to_pandas()
    assert list(mixed.columns) == ["doc_id", "tok_len"]


def test_row_count_mismatch_fails(enc, ray_session):
    def bad(t):
        import pyarrow as _pa

        return _pa.table({"x": _pa.array([1])})

    with pytest.raises(Exception, match="rows"):
        append_columns(enc, "bad", bad, input_columns=["n_tok"])


def test_name_clash_fails(enc, ray_session):
    def clash(t):
        import pyarrow as _pa

        return _pa.table({"n_tok": _pa.array([0] * t.num_rows, _pa.int32())})

    with pytest.raises(Exception, match="clash"):
        append_columns(enc, "clash", clash, input_columns=["n_tok"])


def test_stale_sidecar_detected(enc, ray_session, tmp_path):
    # tamper: claim the sidecar was built from a different base
    import json

    d = _sidecar_dir(enc, "stats")
    man_path = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".manifest.json")
    )[0]
    with open(man_path) as f:
        man = json.load(f)
    orig = dict(man)
    man["base_bytes"] = man["base_bytes"] + 1
    with open(man_path, "w") as f:
        json.dump(man, f)
    try:
        with pytest.raises(ValueError, match="STALE"):
            read_with_sidecars(enc, ["stats"]).to_pandas()
        # and append_columns treats it as stale work to redo
        res = append_columns(enc, "stats", _make_stats_fn(), input_columns=["tokens", "n_tok"])
        assert res["blocks"] == 1
    finally:
        with open(man_path, "w") as f:
            json.dump(orig, f)


def test_missing_sidecar_fails_fast(enc, ray_session):
    with pytest.raises(ValueError, match="missing"):
        read_with_sidecars(enc, ["nonexistent"]).to_pandas()


def test_predicate_filters_and_skips_blocks(ray_session, fixture_parquet, tmp_path):
    """Predicates over base AND sidecar columns: exact WHERE semantics,
    zone-map skip never misaligns (whole blocks skip on both sides)."""
    import ray

    from tokcodec.predicate import col
    from tokcodec.sources.sink import TokbDatasink

    out = str(tmp_path / "enc2")
    ds = ray.data.read_parquet(fixture_parquet, columns=["doc_id", "n_tok", "tokens"])
    ds.sort("n_tok").repartition(6).write_datasink(TokbDatasink(out))

    append_columns(enc_dir=out, name="stats", fn=_make_stats_fn(),
                   input_columns=["tokens", "n_tok"])

    import pyarrow.parquet as pq

    src = pq.read_table(fixture_parquet)
    ntok = src.column("n_tok").to_pandas()
    cut = int(ntok.quantile(0.1))

    # base-column predicate (the sorted layout makes most blocks skip)
    got = read_with_sidecars(out, ["stats"], columns=["doc_id", "n_tok", "tok_len"],
                             predicate=col("n_tok") < cut).to_pandas()
    assert len(got) == int((ntok < cut).sum())
    assert (got["tok_len"] == got["n_tok"]).all()  # tok_len == len(tokens) == n_tok

    # sidecar-column predicate, selection excludes the predicate column
    got2 = read_with_sidecars(out, ["stats"], columns=["doc_id"],
                              predicate=col("even_ntok") == True).to_pandas()  # noqa: E712
    assert len(got2) == int((ntok % 2 == 0).sum())
    assert list(got2.columns) == ["doc_id"]

    # all-blocks-skipped predicate: zero rows (Ray drops the schema of a
    # fully-empty dataset at to_pandas — same as decode_dataset — so only
    # the row count is asserted here; per-block schema fidelity is what
    # the mixed case above exercises)
    got3 = read_with_sidecars(out, ["stats"], columns=["doc_id", "tok_len"],
                              predicate=col("n_tok") < -1).to_pandas()
    assert len(got3) == 0
