"""Ray pipeline tests: planned encode→decode round trip, skew-balanced
partitioning, resume semantics, streaming variant (SURVEY.md §7 steps 1,
5, 6)."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from tokcodec.pipelines import (
    decode_dataset,
    decode_stream,
    encode_dataset,
    encode_stream,
    plan_partitions,
)

TARGET = 1_000_000


@pytest.fixture(scope="module")
def encoded(ray_session, fixture_parquet, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("enc"))
    res = encode_dataset(fixture_parquet, out, target_tokens=TARGET)
    return fixture_parquet, out, res


def test_plan_is_deterministic_and_balanced(fixture_parquet):
    p1 = plan_partitions(fixture_parquet, target_tokens=TARGET, parallel=False)
    p2 = plan_partitions(fixture_parquet, target_tokens=TARGET, parallel=False)
    assert p1 == p2
    masses = [s["n_tok"] for s in p1["partitions"]]
    assert len(masses) >= 3
    # skew balance: no partition more than 2x the target
    assert max(masses) < 2 * TARGET


def test_encode_decode_round_trip(encoded):
    src, out, _res = encoded
    back = decode_dataset(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    orig = pq.read_table(src).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (back["doc_id"] == orig["doc_id"]).all()
    assert (back["n_tok"].to_numpy() == orig["n_tok"].to_numpy()).all()
    assert (back["source"] == orig["source"]).all()
    # the north-rule per-row invariant: token arrays bit-identical
    for a, b in zip(back["tokens"], orig["tokens"]):
        assert a.dtype == np.int32 and (a == b).all()


def test_size_criterion(encoded):
    src, out, res = encoded
    total = sum(m["bytes_out"] for m in res["metrics"])
    assert total <= os.path.getsize(src)


def test_replan_purges_stale_blocks(encoded, tmp_path):
    """Re-encoding the same out_dir with a DIFFERENT plan must remove the
    old plan's surplus blocks — decode previously concatenated rows from
    both plans — and decode must refuse a dir holding foreign-fingerprint
    blocks (tampered / hand-mixed)."""
    import json
    import shutil

    src, shared_out, _ = encoded
    out = str(tmp_path / "replan")
    shutil.copytree(shared_out, out)  # private copy: the fixture is module-scoped
    n_rows = pq.read_table(src).num_rows
    res = encode_dataset(src, out, target_tokens=TARGET * 4)
    blocks = [f for f in os.listdir(out) if f.endswith(".tokb")]
    assert len(blocks) == len(res["plan"]["partitions"])  # no leftovers
    assert decode_dataset(out).count() == n_rows
    # foreign-fingerprint block -> decode refuses
    man = json.load(open(os.path.join(out, "part-00000.manifest.json")))
    man.update(fingerprint="deadbeef", pid=999, block="part-00999.tokb")
    shutil.copy(
        os.path.join(out, "part-00000.tokb"), os.path.join(out, "part-00999.tokb")
    )
    with open(os.path.join(out, "part-00999.manifest.json"), "w") as f:
        json.dump(man, f)
    with pytest.raises(ValueError, match="different plan"):
        decode_dataset(out)
    # re-encoding with the original plan purges the foreign block again
    encode_dataset(src, out, target_tokens=TARGET * 4)
    assert decode_dataset(out).count() == n_rows


def test_resume_skips_complete_partitions(encoded):
    src, out, _ = encoded
    res = encode_dataset(src, out, target_tokens=TARGET)
    assert all(m["resumed"] for m in res["metrics"])


def test_resume_redoes_missing_partition(encoded, tmp_path):
    src, out, _ = encoded
    out2 = str(tmp_path / "enc2")
    shutil.copytree(out, out2)
    os.remove(os.path.join(out2, "part-00001.manifest.json"))
    res = encode_dataset(src, out2, target_tokens=TARGET)
    redone = sorted(m["pid"] for m in res["metrics"] if not m["resumed"])
    assert redone == [1]


def test_resume_detects_truncated_block(encoded, tmp_path):
    src, out, _ = encoded
    out2 = str(tmp_path / "enc3")
    shutil.copytree(out, out2)
    bp = os.path.join(out2, "part-00000.tokb")
    with open(bp, "r+b") as f:
        f.truncate(100)
    res = encode_dataset(src, out2, target_tokens=TARGET)
    redone = sorted(m["pid"] for m in res["metrics"] if not m["resumed"])
    assert redone == [0]


def test_resume_tolerates_manifest_without_metrics(encoded, tmp_path):
    """A complete manifest from an older/foreign layout missing the
    'metrics' dict must RESUME (with None metric values), not KeyError
    the run — the plan fingerprint covers config, not code version."""
    import json

    src, out, _ = encoded
    out2 = str(tmp_path / "enc_nm")
    shutil.copytree(out, out2)
    mp = os.path.join(out2, "part-00000.manifest.json")
    with open(mp) as f:
        man = json.load(f)
    del man["metrics"]
    with open(mp, "w") as f:
        json.dump(man, f)
    res = encode_dataset(src, out2, target_tokens=TARGET)
    m0 = next(m for m in res["metrics"] if m["pid"] == 0)
    assert m0["resumed"] and m0["rows"] is None  # metrics unknown, run alive
    assert all(m["resumed"] for m in res["metrics"])


def test_encode_dataset_tuple_concurrency_on_tasks(fixture_parquet, tmp_path,
                                                   ray_session):
    """The documented (min, max) concurrency must not crash the default
    compute="tasks" path — Ray rejects tuples for plain functions, so
    the upper bound is used as the task cap."""
    out = str(tmp_path / "enc_tc")
    res = encode_dataset(fixture_parquet, out, target_tokens=TARGET,
                         concurrency=(1, 2))
    assert res["metrics"] and not any(m["resumed"] for m in res["metrics"])


def test_resume_output_byte_identical(encoded, tmp_path):
    """Kill-and-resume must reproduce the identical bytes (deterministic
    plan + deterministic codecs, SURVEY.md §7 'Determinism for resume')."""
    src, out, _ = encoded
    ref = {}
    for name in sorted(os.listdir(out)):
        if name.endswith(".tokb"):
            with open(os.path.join(out, name), "rb") as f:
                ref[name] = f.read()
    # simulate a killed run: half the partitions never completed
    out2 = str(tmp_path / "enc_killed")
    os.makedirs(out2)
    shutil.copy(os.path.join(out, "plan.json"), out2)
    done = sorted(n for n in os.listdir(out) if n.endswith(".tokb"))[: len(ref) // 2]
    for name in done:
        shutil.copy(os.path.join(out, name), out2)
        shutil.copy(
            os.path.join(out, name.replace(".tokb", ".manifest.json")), out2
        )
    res = encode_dataset(src, out2, target_tokens=TARGET)
    assert sum(1 for m in res["metrics"] if m["resumed"]) == len(done)
    for name, blob in ref.items():
        with open(os.path.join(out2, name), "rb") as f:
            assert f.read() == blob, f"{name} differs after resume"


def test_config_change_invalidates(encoded, tmp_path):
    src, out, _ = encoded
    out2 = str(tmp_path / "enc4")
    shutil.copytree(out, out2)
    res = encode_dataset(src, out2, target_tokens=TARGET // 2)
    assert not any(m.get("resumed") for m in res["metrics"])


def test_column_projection_at_read(ray_session, fixture_parquet, tmp_path):
    out = str(tmp_path / "enc5")
    encode_dataset(
        fixture_parquet, out, target_tokens=TARGET, columns=["doc_id", "n_tok"]
    )
    ds = decode_dataset(out)
    assert set(ds.schema().names) == {"doc_id", "n_tok"}


def test_stream_round_trip(ray_session, fixture_parquet):
    import ray.data

    src = ray.data.read_parquet(fixture_parquet)
    enc = encode_stream(src).materialize()
    assert enc.count() >= 1
    dec = decode_stream(enc)
    assert dec.count() == pq.read_metadata(fixture_parquet).num_rows
    total_out = sum(r["bytes_out"] for r in enc.take_all())
    assert total_out <= os.path.getsize(fixture_parquet) * 1.2


def test_parallel_plan_identical_to_serial(ray_session, tmp_path):
    """The two-wave distributed stats pass (scalar totals + exact cut
    rows; O(partitions) driver memory) must produce partitions
    bit-identical to the serial full-cumsum plan, across multiple files
    with different row-group layouts."""
    from tokcodec.synth import write_fixture

    d = tmp_path / "multi"
    d.mkdir()
    write_fixture(str(d / "a.parquet"), n_rows=4000, seed=1, row_group_size=256)
    write_fixture(str(d / "b.parquet"), n_rows=2500, seed=2, row_group_size=100)
    write_fixture(str(d / "c.parquet"), n_rows=700, seed=3, row_group_size=700)
    ser = plan_partitions(str(d), target_tokens=TARGET, parallel=False)
    par = plan_partitions(str(d), target_tokens=TARGET, parallel=True)
    assert ser["partitions"] == par["partitions"]
    assert ser["fingerprint"] == par["fingerprint"]


def test_plan_cuts_snap_to_row_group_boundaries(tmp_path):
    """With snapping on (the default), every partition cut that can land
    on a row-group boundary within snap_frac*target does — so no row
    group is decoded by two partitions — while a cut forced inside a
    group (deviation beyond tolerance) stays exact."""
    from tokcodec.synth import write_fixture

    p = str(tmp_path / "snap.parquet")
    write_fixture(p, n_rows=6000, seed=7, row_group_size=256, heavy_tail=False)
    md = pq.ParquetFile(p).metadata
    bounds = {0}
    acc = 0
    for i in range(md.num_row_groups):
        acc += md.row_group(i).num_rows
        bounds.add(acc)

    snapped = plan_partitions(p, target_tokens=TARGET, parallel=False)
    cuts = [s["row_start"] for s in snapped["partitions"]]
    assert len(cuts) >= 3
    assert all(c in bounds for c in cuts), f"unaligned cuts: {[c for c in cuts if c not in bounds]}"
    # balance survives snapping: row groups are ~26k tokens vs the 1M
    # target, so deviation stays well under the 2x skew bar
    masses = [s["n_tok"] for s in snapped["partitions"]]
    assert max(masses) < 2 * TARGET

    # snap off => exact equal-mass cuts, generally NOT aligned
    exact = plan_partitions(p, target_tokens=TARGET, parallel=False, snap_frac=0.0)
    exact_cuts = [s["row_start"] for s in exact["partitions"][1:]]
    assert any(c not in bounds for c in exact_cuts)


def test_plan_snap_covers_target_near_rg_mass(tmp_path):
    """When target_tokens ~ row-group mass, snap_frac*target alone is
    smaller than the typical cut-to-boundary deviation (uniform in
    [0, rg_mass/2]) — the row-group-mass tolerance floor must still
    align essentially every cut so no row group decodes twice."""
    from tokcodec.synth import write_fixture

    p = str(tmp_path / "nearmass.parquet")
    write_fixture(p, n_rows=6000, seed=13, row_group_size=500, heavy_tail=False)
    md = pq.ParquetFile(p).metadata
    bounds = {0}
    acc = 0
    for i in range(md.num_row_groups):
        acc += md.row_group(i).num_rows
        bounds.add(acc)
    total = sum(
        pq.ParquetFile(p).read_row_groups([i], columns=["n_tok"]).column(0).to_numpy().sum()
        for i in range(md.num_row_groups)
    )
    rg_mass = total // md.num_row_groups
    # target == one row-group mass: the hostile regime for target-only tolerance
    plan = plan_partitions(p, target_tokens=int(rg_mass), parallel=False)
    cuts = [s["row_start"] for s in plan["partitions"]]
    assert len(cuts) >= 6
    unaligned = [c for c in cuts if c not in bounds]
    assert not unaligned, f"unaligned cuts at target~rg_mass: {unaligned}"
    # the floor is capped: partitions stay within the documented ~2.1x bar
    masses = [s["n_tok"] for s in plan["partitions"]]
    assert max(masses) < 2.2 * rg_mass


def test_snap_tolerance_formula():
    """The tolerance is max(snap_frac*target, min(0.6*mean_rg_mass,
    0.55*target)) in exact integer arithmetic, and 0 when snapping is
    disabled."""
    from tokcodec.pipelines.encode import _snap_tolerance

    # floor engages below the cap: mean rg mass 500 -> 0.6*500 = 300 > 200
    assert _snap_tolerance(0.2, 1000, 5_000, 10) == 300
    # cap engages: mean rg mass >= target -> floor capped at 0.55*target
    assert _snap_tolerance(0.4, 1000, 10_000, 10) == 550
    assert _snap_tolerance(0.4, 1000, 100_000, 1) == 550
    # target-frac dominates when row groups are small
    assert _snap_tolerance(0.4, 1000, 1_000, 10) == 400
    # snapping disabled
    assert _snap_tolerance(0.0, 1000, 10_000, 10) == 0
    # no row groups: fall back to the target-frac tolerance
    assert _snap_tolerance(0.4, 1000, 0, 0) == 400


def test_plan_null_token_counts_are_zero_mass(tmp_path):
    """Null n_tok rows must contribute zero mass (Arrow's null→NaN→int64
    cast would otherwise land on int64-min and poison the cumulative
    cuts), while every row still lands in exactly one partition."""
    import pyarrow as pa

    p = str(tmp_path / "nulls.parquet")
    n_tok = [10] * 50 + [None] * 5 + [20] * 50
    tokens = [[1] * (v or 0) for v in n_tok]
    pq.write_table(
        pa.table(
            {
                "doc_id": [f"d{i}" for i in range(len(n_tok))],
                "tokens": pa.array(tokens, pa.list_(pa.int32())),
                "n_tok": pa.array(n_tok, pa.int32()),
            }
        ),
        p,
        row_group_size=16,
    )
    plan = plan_partitions(p, target_tokens=500, parallel=False)
    parts = plan["partitions"]
    assert all(s["n_tok"] >= 0 for s in parts), [s["n_tok"] for s in parts]
    assert sum(s["n_tok"] for s in parts) == 10 * 50 + 20 * 50
    # complete, non-overlapping row coverage
    bounds = sorted((s["row_start"], s["row_end"]) for s in parts)
    assert bounds[0][0] == 0 and bounds[-1][1] == len(n_tok)
    assert all(a[1] == b[0] for a, b in zip(bounds, bounds[1:]))


def test_plan_snap_keeps_exact_cut_inside_monster_group(tmp_path):
    """One row group holding >> target tokens must still be cut exactly
    (mid-group): the nearest boundary's deviation exceeds tolerance, so
    snapping declines and skew balancing wins."""
    from tokcodec.synth import write_fixture

    p = str(tmp_path / "monster.parquet")
    # one giant row group: every boundary candidate is 8000 rows away
    write_fixture(p, n_rows=8000, seed=11, row_group_size=8000, heavy_tail=False)
    plan = plan_partitions(p, target_tokens=TARGET, parallel=False)
    cuts = [s["row_start"] for s in plan["partitions"][1:]]
    assert cuts, "expected multiple partitions"
    assert all(0 < c < 8000 for c in cuts)
    masses = [s["n_tok"] for s in plan["partitions"]]
    assert max(masses) < 2 * TARGET


def test_parallel_plan_snap_parity(ray_session, tmp_path):
    """Snapping must not break serial/distributed parity: the wave-2 cut
    tasks see the same row-group boundary candidates as the serial
    planner (chunk edges are themselves row-group boundaries)."""
    from tokcodec.synth import write_fixture

    d = tmp_path / "snapmulti"
    d.mkdir()
    write_fixture(str(d / "a.parquet"), n_rows=5000, seed=21, row_group_size=128)
    write_fixture(str(d / "b.parquet"), n_rows=3000, seed=22, row_group_size=512)
    ser = plan_partitions(str(d), target_tokens=TARGET, parallel=False)
    par = plan_partitions(str(d), target_tokens=TARGET, parallel=True)
    assert ser["partitions"] == par["partitions"]


def test_fingerprint_tracks_file_content(tmp_path):
    """Regenerating an input file in place (same path, new bytes) must
    change the plan fingerprint so stale manifests don't resume."""
    from tokcodec.synth import write_fixture

    p = str(tmp_path / "t.parquet")
    write_fixture(p, n_rows=500, seed=1)
    fp1 = plan_partitions(p, target_tokens=TARGET, parallel=False)["fingerprint"]
    os.utime(p, ns=(1, 1))  # content-change proxy: mtime moved
    fp2 = plan_partitions(p, target_tokens=TARGET, parallel=False)["fingerprint"]
    assert fp1 != fp2


def test_manifest_records_codec_choices(encoded):
    """SURVEY §7 step 3: the manifest records which codec won per column."""
    from tokcodec import manifest as mf

    _src, out, _res = encoded
    mans = mf.list_manifests(out)
    assert mans and all("codecs" in m for m in mans)
    c0 = mans[0]["codecs"]
    assert set(c0) == {"doc_id", "tokens", "n_tok", "source"}
    assert c0["tokens"].startswith("list(")
    known = {"plain", "bp", "for", "delta", "rle", "dict", "fsst", "pbytes", "dbytes", "fdict", "fplain", "fbss", "bps", "vrank", "vtop"}
    assert c0["source"] in known and c0["n_tok"] in known


def test_encode_actor_pool_byte_identical(ray_session, fixture_parquet, tmp_path):
    """compute="actors" (stateful actor-pool stage) must produce blocks
    byte-identical to the default task-pool path — same plan, same
    deterministic codecs, different execution strategy."""
    import tokcodec.manifest as mf

    out_t = str(tmp_path / "enc_tasks")
    out_a = str(tmp_path / "enc_actors")
    encode_dataset(fixture_parquet, out_t, target_tokens=TARGET)
    encode_dataset(fixture_parquet, out_a, target_tokens=TARGET, compute="actors")
    names = sorted(n for n in os.listdir(out_t) if n.endswith(".tokb"))
    assert names == sorted(n for n in os.listdir(out_a) if n.endswith(".tokb"))
    for n in names:
        with open(os.path.join(out_t, n), "rb") as f1, open(
            os.path.join(out_a, n), "rb"
        ) as f2:
            assert f1.read() == f2.read(), n


def test_read_rows_falls_back_without_memory_map(fixture_parquet, monkeypatch):
    """_read_rows memory-maps local files; on filesystems where mmap is
    unavailable (remote URIs, some network mounts) it must fall back to
    the plain reader and return identical rows."""
    import pyarrow as pa

    from tokcodec.pipelines.encode import _read_rows

    path = fixture_parquet
    if os.path.isdir(path):
        path = sorted(
            os.path.join(path, n)
            for n in os.listdir(path)
            if n.endswith(".parquet")
        )[0]
    mapped = _read_rows(path, 5, 300, None)

    def boom(_):
        raise OSError("mmap unavailable")

    monkeypatch.setattr(pa, "memory_map", boom)
    plain = _read_rows(path, 5, 300, None)
    assert plain.equals(mapped)


def test_rp_row_aware_block_override(monkeypatch, tmp_path):
    """_rp keeps >=~2000 rows per block on row-poor tables (floor 4) and
    DISENGAGES on row-rich ones so shuffle parallelism is never capped."""
    import pyarrow as pa

    import ray.data
    from tokcodec.pipelines import queries as q

    captured = {}

    def fake_read_parquet(path, **kw):
        captured.update(kw, path=path)
        return "ds"

    monkeypatch.setattr(ray.data, "read_parquet", fake_read_parquet)

    small = tmp_path / "small.parquet"
    pq.write_table(pa.table({"x": list(range(500))}), small)
    captured.clear()
    q._rp(str(tmp_path), "small")
    assert captured["override_num_blocks"] == 4  # floor: multi-block paths run

    mid = tmp_path / "mid.parquet"
    pq.write_table(pa.table({"x": list(range(12_000))}), mid)
    captured.clear()
    q._rp(str(tmp_path), "mid")
    assert captured["override_num_blocks"] == 6  # ceil(12000 / 2000)

    # explicit override wins
    captured.clear()
    q._rp(str(tmp_path), "mid", override_num_blocks=2)
    assert captured["override_num_blocks"] == 2

    # row-rich: want >= 2*cpus -> no override, Ray's default splitting
    big = tmp_path / "big.parquet"
    pq.write_table(pa.table({"x": np.zeros(600_000, np.int64)}), big)
    captured.clear()
    q._rp(str(tmp_path), "big")
    assert "override_num_blocks" not in captured


def test_decode_refuses_incomplete_encode(encoded, tmp_path):
    """An interrupted encode (manifest missing for a planned pid) must not
    silently decode to a partial dataset."""
    src, shared_out, _ = encoded
    out = str(tmp_path / "partial")
    shutil.copytree(shared_out, out)
    victims = [f for f in sorted(os.listdir(out)) if f.endswith(".manifest.json")]
    os.remove(os.path.join(out, victims[-1]))
    with pytest.raises(ValueError, match="incomplete encode"):
        decode_dataset(out)
    # explicit opt-in decodes what exists
    n = decode_dataset(out, allow_partial=True).count()
    total = pq.read_table(src).num_rows
    assert 0 < n < total


def test_decode_refuses_fingerprintless_manifest(encoded, tmp_path):
    """A sink-style manifest (no fingerprint) copied into a planned dir is
    a foreign block, not a pass — strict match."""
    import json

    src, shared_out, _ = encoded
    out = str(tmp_path / "mixed")
    shutil.copytree(shared_out, out)
    man = json.load(open(os.path.join(out, "part-00000.manifest.json")))
    man.pop("fingerprint", None)
    man.update(pid=998, block="part-00998.tokb")
    shutil.copy(
        os.path.join(out, "part-00000.tokb"), os.path.join(out, "part-00998.tokb")
    )
    with open(os.path.join(out, "part-00998.manifest.json"), "w") as f:
        json.dump(man, f)
    with pytest.raises(ValueError, match="different plan"):
        decode_dataset(out)


def test_purge_sweeps_orphan_blocks_and_tmps(encoded, tmp_path):
    """Crashed atomic writes leave part-*.tokb without a manifest and
    *.tmp leftovers; a re-encode over the dir must sweep both."""
    src, shared_out, _ = encoded
    out = str(tmp_path / "orphans")
    shutil.copytree(shared_out, out)
    # orphan block (no manifest) + tmp leftover of a crashed write
    shutil.copy(
        os.path.join(out, "part-00000.tokb"), os.path.join(out, "part-00997.tokb")
    )
    with open(os.path.join(out, "part-00996.tokb.tmp"), "wb") as f:
        f.write(b"half-written")
    res = encode_dataset(src, out, target_tokens=TARGET)
    assert all(m["resumed"] for m in res["metrics"])  # same plan: pure resume
    names = set(os.listdir(out))
    assert "part-00997.tokb" not in names
    assert "part-00996.tokb.tmp" not in names
    n_rows = pq.read_table(src).num_rows
    assert decode_dataset(out).count() == n_rows


def test_encode_zero_row_input_yields_empty_plan(ray_session, tmp_path):
    """A zero-row input file must produce a clean empty plan (no
    partitions, no blocks) — not a crash or a degenerate partition."""
    import pyarrow as pa

    src = str(tmp_path / "empty.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], pa.string()),
                "tokens": pa.array([], pa.list_(pa.int32())),
                "n_tok": pa.array([], pa.int32()),
                "source": pa.array([], pa.string()),
            }
        ),
        src,
    )
    out = str(tmp_path / "out")
    res = encode_dataset([src], out)
    assert res["plan"]["partitions"] == []
    assert not [f for f in os.listdir(out) if f.endswith(".tokb")]


def test_encode_dictionary_parquet_input(ray_session, tmp_path):
    """Parquet files written with dictionary encoding on a string column
    decode back bit-identical through the full distributed path (the
    reader may surface dictionary-typed Arrow columns)."""
    import pyarrow as pa

    from tokcodec.blocks import decode_file

    n = 400
    rng = np.random.default_rng(3)
    toks = [list(map(int, rng.integers(0, 99, rng.integers(1, 30)))) for _ in range(n)]
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i:04d}" for i in range(n)]),
            "tokens": pa.array(toks, pa.list_(pa.int32())),
            "n_tok": pa.array([len(x) for x in toks], pa.int32()),
            "source": pa.array(["web", "book"] * (n // 2)),
        }
    )
    src = str(tmp_path / "dict.parquet")
    pq.write_table(t, src, use_dictionary=["source"], row_group_size=64)
    out = str(tmp_path / "out")
    encode_dataset([src], out)
    import pyarrow as pa2

    parts = sorted(f for f in os.listdir(out) if f.endswith(".tokb"))
    got = pa2.concat_tables([decode_file(os.path.join(out, p))[0] for p in parts])
    want = pq.read_table(src)
    assert got.sort_by("doc_id").cast(want.schema).equals(want.sort_by("doc_id"))
