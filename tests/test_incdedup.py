"""Incremental exact dedup against a persisted hash index: batch-order
semantics, retry idempotence, run-scoped exclusion, index compaction."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from tokcodec.functions.incdedup import (
    _ensure_meta,
    compact_index,
    dedup_against_index,
    mark_run_complete,
)

N_BUCKETS = 8  # small so several buckets actually receive rows


def _batch(rows: list[tuple[str, str]]):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
            }
        )
    )


SEED = [
    ("s1", "the quick brown fox"),
    ("s2", "jumps over the lazy dog"),
    ("s3", "the quick brown fox"),  # dup within seed: s1 wins
    ("s4", "pack my box"),
]
NEW = [
    ("n1", "five dozen jugs"),            # genuinely new
    ("n2", "the quick brown fox"),        # known from seed: dropped
    ("n3", "five dozen jugs"),            # dup within batch: n1 wins
    ("n0", "pack my box"),                # known, even though n0 < s4
    ("n4", "grumpy wizards make toxic brew"),
]


def _ids(ds) -> list[str]:
    df = ds.to_pandas()  # Ray drops the schema of a fully-empty dataset
    return sorted(df["doc_id"]) if len(df) else []


@pytest.fixture()
def index_dir(tmp_path):
    return str(tmp_path / "idx")


def test_seed_then_incremental(ray_session, index_dir):
    got = _ids(dedup_against_index(_batch(SEED), index_dir,
                                   n_buckets=N_BUCKETS, run_id="seed"))
    assert got == ["s1", "s2", "s4"]

    got2 = _ids(dedup_against_index(_batch(NEW), index_dir,
                                    n_buckets=N_BUCKETS, run_id="b1"))
    # n2/n0 known (regardless of id order vs the seed), n3 loses to n1
    assert got2 == ["n1", "n4"]

    # a third batch repeating everything accepted so far: nothing passes
    all_rows = SEED + NEW
    got3 = _ids(dedup_against_index(_batch(all_rows), index_dir,
                                    n_buckets=N_BUCKETS, run_id="b2"))
    assert got3 == []


def test_retry_same_run_id_is_idempotent(ray_session, index_dir):
    dedup_against_index(_batch(SEED), index_dir, n_buckets=N_BUCKETS, run_id="seed")
    first = _ids(dedup_against_index(_batch(NEW), index_dir,
                                     n_buckets=N_BUCKETS, run_id="b1"))
    # the crashed-job re-run: the index already holds b1's own files,
    # but run-scoped exclusion means the verdicts don't change
    retry = _ids(dedup_against_index(_batch(NEW), index_dir,
                                     n_buckets=N_BUCKETS, run_id="b1"))
    assert retry == first == ["n1", "n4"]


def test_read_only_mode_does_not_update(ray_session, index_dir):
    dedup_against_index(_batch(SEED), index_dir, n_buckets=N_BUCKETS, run_id="seed")
    q = _ids(dedup_against_index(_batch(NEW), index_dir, n_buckets=N_BUCKETS,
                                 update_index=False, run_id="q"))
    assert q == ["n1", "n4"]
    # nothing was persisted: the same question answers the same way
    assert _ids(dedup_against_index(_batch(NEW), index_dir, n_buckets=N_BUCKETS,
                                    update_index=False, run_id="q2")) == ["n1", "n4"]


def test_run_id_validated(ray_session, index_dir):
    # "compact" is compact_index's reserved fold-file name: accepting it
    # would exclude (then overwrite) the ENTIRE compacted index
    with pytest.raises(ValueError, match="compact"):
        dedup_against_index(_batch(SEED), index_dir, n_buckets=N_BUCKETS,
                            run_id="compact")
    for bad in ("", "a/b", "../esc", ".hidden"):
        with pytest.raises(ValueError, match="run_id"):
            dedup_against_index(_batch(SEED), index_dir, n_buckets=N_BUCKETS,
                                run_id=bad)


def test_bucket_config_pinned(ray_session, index_dir):
    dedup_against_index(_batch(SEED), index_dir, n_buckets=N_BUCKETS, run_id="seed")
    with pytest.raises(ValueError, match="n_buckets"):
        dedup_against_index(_batch(NEW), index_dir, n_buckets=2 * N_BUCKETS, run_id="b")
    with pytest.raises(ValueError, match="power of two"):
        _ensure_meta(index_dir + "2", 12)
    with pytest.raises(ValueError, match="power of two"):
        _ensure_meta(index_dir + "3", 1)


def test_compact_index_folds_files(ray_session, index_dir):
    dedup_against_index(_batch(SEED), index_dir, n_buckets=N_BUCKETS, run_id="seed")
    dedup_against_index(_batch(NEW), index_dir, n_buckets=N_BUCKETS, run_id="b1")
    # caller consumed both runs' outputs -> safe to fold
    mark_run_complete(index_dir, "seed")
    mark_run_complete(index_dir, "b1")

    def n_files():
        return sum(
            len([f for f in os.listdir(os.path.join(index_dir, d)) if f.endswith(".parquet")])
            for d in os.listdir(index_dir)
            if d.startswith("bucket=")
        )

    before = n_files()
    res = compact_index(index_dir)
    assert res["hashes"] == 5  # 5 distinct texts accepted overall
    assert n_files() < before
    # nothing new to fold: the no-op path reports the same count from
    # footers without rewriting compact.parquet
    mtimes = {
        d: os.path.getmtime(os.path.join(index_dir, d, "compact.parquet"))
        for d in os.listdir(index_dir)
        if d.startswith("bucket=")
        and os.path.exists(os.path.join(index_dir, d, "compact.parquet"))
    }
    res2 = compact_index(index_dir)
    assert res2["hashes"] == 5
    for d, m in mtimes.items():
        assert os.path.getmtime(os.path.join(index_dir, d, "compact.parquet")) == m
    # every remaining file is the folded one
    for d in os.listdir(index_dir):
        if d.startswith("bucket="):
            fs = [f for f in os.listdir(os.path.join(index_dir, d)) if f.endswith(".parquet")]
            assert fs in ([], ["compact.parquet"])
    # semantics unchanged after compaction
    got = _ids(dedup_against_index(_batch(SEED + NEW), index_dir,
                                   n_buckets=N_BUCKETS, run_id="b2"))
    assert got == []
    # and a genuinely new doc still passes
    got2 = _ids(dedup_against_index(_batch([("z1", "a brand new sentence")]),
                                    index_dir, n_buckets=N_BUCKETS, run_id="b3"))
    assert got2 == ["z1"]


def test_file_bloom_probe_vectorized():
    """any_might_contain_ints mirrors build_bloom's int hash pair: every
    member probes True; a fixed disjoint candidate set probes False
    (deterministic hashing — pinned, not probabilistic at test time)."""
    import numpy as np

    from tokcodec.bloom import any_might_contain_ints, build_bloom

    members = pa.array(list(range(1000, 2000)), pa.int64())
    bl = build_bloom(members)
    assert any_might_contain_ints(bl, pa.array([1500], pa.int64()))
    assert any_might_contain_ints(bl, pa.array([5, 1000], pa.int64()))
    # 0 candidates: nothing to look up, file is skippable
    assert not any_might_contain_ints(bl, pa.array([], pa.int64()))
    disjoint = pa.array((np.arange(8) * 7 + 3_000_000_000).tolist(), pa.int64())
    assert not any_might_contain_ints(bl, disjoint)


def test_file_blooms_value_identical_and_skip(ray_session, tmp_path):
    """file_blooms=True must be verdict-identical to the plain path, and
    a shard file with no candidate overlap must actually be skippable
    (probe returns False on its bloom sidecar)."""
    from tokcodec.functions.incdedup import _file_bloom, _shard_files

    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloomed")
    for idx, fb in ((plain, False), (bloomed, True)):
        a = _ids(dedup_against_index(_batch(SEED), idx, n_buckets=N_BUCKETS,
                                     run_id="seed", file_blooms=fb))
        b = _ids(dedup_against_index(_batch(NEW), idx, n_buckets=N_BUCKETS,
                                     run_id="b1", file_blooms=fb))
        assert (a, b) == (["s1", "s2", "s4"], ["n1", "n4"])
    # every non-empty bloomed shard file carries a bloom sidecar over h1
    import pyarrow.parquet as pq_

    seen = 0
    for d in os.listdir(bloomed):
        if not d.startswith("bucket="):
            continue
        for f in _shard_files(os.path.join(bloomed, d)):
            if pq_.read_metadata(f).num_rows == 0:
                continue
            bl = _file_bloom(f)
            assert bl is not None and bl["col"] == "h1"
            seen += 1
    assert seen > 0
    # compaction preserves the bloom on the folded file
    mark_run_complete(bloomed, "seed")
    mark_run_complete(bloomed, "b1")
    compact_index(bloomed)
    for d in os.listdir(bloomed):
        if d.startswith("bucket="):
            for f in _shard_files(os.path.join(bloomed, d)):
                if pq_.read_metadata(f).num_rows:
                    assert _file_bloom(f) is not None
    # semantics still identical after compaction, with blooms probing
    got = _ids(dedup_against_index(_batch(SEED + NEW), bloomed,
                                   n_buckets=N_BUCKETS, run_id="b2",
                                   file_blooms=True))
    assert got == []


def test_compact_skips_crashed_pending_run(ray_session, index_dir):
    """A not-yet-marked batch's shard files must survive compaction:
    folding them into compact.parquet would strip the run_id scoping
    and the retry would drop its own docs as 'already present'.  Runs
    are unmarked until the CALLER records consumption — so 'crashed
    before the caller persisted the output' is simply the default
    state here."""
    dedup_against_index(_batch(SEED), index_dir, n_buckets=N_BUCKETS, run_id="seed")
    mark_run_complete(index_dir, "seed")
    first = _ids(dedup_against_index(_batch(NEW), index_dir,
                                     n_buckets=N_BUCKETS, run_id="b1"))
    # b1's driver "crashed" before its output was durably consumed:
    # shard files exist, no completion record was written

    def n_run_files(run):
        return sum(
            1
            for d in os.listdir(index_dir)
            if d.startswith("bucket=")
            for f in os.listdir(os.path.join(index_dir, d))
            if f == f"{run}.parquet"
        )

    compact_index(index_dir)
    assert n_run_files("b1") > 0  # pending run untouched
    assert n_run_files("seed") == 0  # completed run folded
    # the retry still excludes its own earlier files and re-accepts the
    # same docs instead of seeing them as already-present
    retry = _ids(dedup_against_index(_batch(NEW), index_dir,
                                     n_buckets=N_BUCKETS, run_id="b1"))
    assert retry == first == ["n1", "n4"]
    # the retry's output is consumed and marked, so the next compact
    # folds it
    mark_run_complete(index_dir, "b1")
    compact_index(index_dir)
    assert n_run_files("b1") == 0
    got = _ids(dedup_against_index(_batch(SEED + NEW), index_dir,
                                   n_buckets=N_BUCKETS, run_id="b2"))
    assert got == []
    # fold_all: the no-pending-batches / legacy escape hatch folds the
    # unmarked b2 too
    compact_index(index_dir, fold_all=True)
    assert n_run_files("b2") == 0
    assert _ids(dedup_against_index(_batch(SEED + NEW), index_dir,
                                    n_buckets=N_BUCKETS, run_id="b3")) == []


# ------------------------------------------------ near-dup variant ----

WORDS20 = [
    " ".join(f"w{i}_{j}" for j in range(20)) for i in range(6)
]  # six fully word-disjoint 20-word docs


@pytest.mark.parametrize("file_blooms", [False, True])
def test_near_dup_seed_then_batch(ray_session, tmp_path, file_blooms):
    from tokcodec.functions.incdedup import near_dup_against_index

    idx = str(tmp_path / "nidx")
    seed = [(f"s{i}", WORDS20[i]) for i in range(4)]
    got = _ids(near_dup_against_index(_batch(seed), idx, n_buckets=N_BUCKETS,
                                      run_id="seed", file_blooms=file_blooms))
    assert got == ["s0", "s1", "s2", "s3"]  # mutually word-disjoint

    batch = [
        ("n1", WORDS20[0] + " tail"),     # near-dup of s0: flagged
        ("n2", WORDS20[4]),               # genuinely new: accepted
        ("n3", WORDS20[5]),               # smaller id, accepted
        ("n4", WORDS20[5] + " extra"),    # near-dup of n3 within batch: flagged
    ]
    got2 = _ids(near_dup_against_index(_batch(batch), idx, n_buckets=N_BUCKETS,
                                       run_id="b1", file_blooms=file_blooms))
    assert got2 == ["n2", "n3"]

    # everything seen so far is now a near-dup
    got3 = _ids(near_dup_against_index(_batch(batch), idx, n_buckets=N_BUCKETS,
                                       run_id="b2", file_blooms=file_blooms))
    assert got3 == []


def test_near_dup_retry_idempotent(ray_session, tmp_path):
    from tokcodec.functions.incdedup import near_dup_against_index

    idx = str(tmp_path / "nidx")
    seed = [(f"s{i}", WORDS20[i]) for i in range(3)]
    near_dup_against_index(_batch(seed), idx, n_buckets=N_BUCKETS, run_id="seed")
    batch = [("n1", WORDS20[0] + " tail"), ("n2", WORDS20[4])]
    first = _ids(near_dup_against_index(_batch(batch), idx,
                                        n_buckets=N_BUCKETS, run_id="b1"))
    retry = _ids(near_dup_against_index(_batch(batch), idx,
                                        n_buckets=N_BUCKETS, run_id="b1"))
    assert retry == first == ["n2"]


def test_near_dup_rejects_exact_index_dir(ray_session, tmp_path):
    from tokcodec.functions.incdedup import near_dup_against_index

    idx = str(tmp_path / "mixidx")
    dedup_against_index(_batch(SEED), idx, n_buckets=N_BUCKETS, run_id="seed")
    with pytest.raises(ValueError, match="key"):
        near_dup_against_index(_batch(SEED), idx, n_buckets=N_BUCKETS, run_id="b")


def test_near_dup_duplicated_batch_row_not_self_flagged(ray_session, tmp_path):
    # an upstream retry/union can ship the same (id, text) row twice;
    # the doc must still be accepted ONCE, not flagged against itself
    from tokcodec.functions.incdedup import near_dup_against_index

    idx = str(tmp_path / "nidx")
    batch = [("n1", WORDS20[0]), ("n1", WORDS20[0]), ("n2", WORDS20[1])]
    got = _ids(near_dup_against_index(_batch(batch), idx,
                                      n_buckets=N_BUCKETS, run_id="b1"))
    assert got == ["n1", "n2"]
    # and a re-submission under a NEW run id sees it as a known near-dup
    got2 = _ids(near_dup_against_index(_batch([("n9", WORDS20[0])]), idx,
                                       n_buckets=N_BUCKETS, run_id="b2"))
    assert got2 == []


@pytest.mark.parametrize("file_blooms", [False, True])
def test_randomized_batches_match_reference_model(ray_session, tmp_path, file_blooms):
    """Seeded random batch sequences vs a driver-side reference model:
    accepted == {min id per text among texts unseen before this batch},
    batch after batch, for several bucket widths.  Runs with and
    without shard blooms — a bloom can only ever skip a file that
    provably holds no candidate, so verdicts must be identical."""
    import numpy as np

    rng = np.random.RandomState(7)
    for trial, nb in enumerate((2, 8, 64)):
        idx = str(tmp_path / f"ridx{trial}")
        seen: set[str] = set()
        next_id = 0
        for b in range(3):
            n = int(rng.randint(5, 40))
            texts = [f"t{rng.randint(0, 30)}" for _ in range(n)]
            rows = []
            for t in texts:
                rows.append((f"d{next_id:06d}", t))
                next_id += 1
            expect = sorted(
                min(i for i, t2 in rows if t2 == t)
                for t in {t for _, t in rows}
                if t not in seen
            )
            got = _ids(dedup_against_index(_batch(rows), idx, n_buckets=nb,
                                           run_id=f"b{b}",
                                           file_blooms=file_blooms))
            assert got == expect, (trial, b)
            seen |= {t for _, t in rows}
