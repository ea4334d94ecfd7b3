"""Block-stitched sessionize (functions/sessionize.py) vs a per-user
pandas reference, on data engineered so hot users span many sorted
blocks — the case the boundary stitching exists for."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tokcodec.functions.sessionize import sessionize


def _ref(df: pd.DataFrame) -> pd.DataFrame:
    def per_user(g):
        g = g.sort_values("ts", kind="stable")
        brk = (g["ts"].diff().dt.total_seconds().fillna(0) > 1800).cumsum()
        r = g.groupby(brk).size().reset_index(drop=True)
        return pd.DataFrame({"session_id": np.arange(len(r)), "n_events": r.values})

    out = (
        df.groupby("user_id", group_keys=True)
        .apply(per_user, include_groups=False)
        .reset_index(level=0)
        .reset_index(drop=True)
    )
    return (
        out[["user_id", "session_id", "n_events"]]
        .astype("int64")
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )


def _run(df: pd.DataFrame, n_parts: int) -> pd.DataFrame:
    import ray.data

    ds = ray.data.from_pandas(df).repartition(n_parts)
    return (
        sessionize(ds)
        .to_pandas()
        .astype("int64")
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )


@pytest.mark.usefixtures("ray_session")
def test_sessionize_hot_user_spans_blocks():
    rng = np.random.default_rng(7)
    rows = []
    for u, n in [(1, 5000)] + [(u, int(rng.integers(1, 80))) for u in range(2, 52)]:
        t = np.cumsum(rng.integers(1, 4000, size=n)) * 1_000_000
        rows.append(pd.DataFrame({"user_id": u, "ts": pd.to_datetime(t, unit="us")}))
    df = pd.concat(rows, ignore_index=True).sample(frac=1, random_state=0)
    df = df.reset_index(drop=True)
    pd.testing.assert_frame_equal(_run(df, 37), _ref(df))


@pytest.mark.usefixtures("ray_session")
def test_sessionize_boundary_gaps_exact():
    # gaps exactly at / just over the 1800 s threshold: > breaks, == doesn't
    ts = pd.to_datetime(
        np.cumsum([0, 1800_000_000, 1800_000_001, 1, 1800_000_000]), unit="us"
    )
    df = pd.DataFrame({"user_id": 9, "ts": ts})
    out = _run(df, 3)
    # sessions: [e0,e1] (gap==1800s keeps), break, [e2,e3,e4]
    assert out.to_dict("records") == [
        {"user_id": 9, "session_id": 0, "n_events": 2},
        {"user_id": 9, "session_id": 1, "n_events": 3},
    ]


@pytest.mark.usefixtures("ray_session")
def test_sessionize_duplicate_timestamps_and_singletons():
    rng = np.random.default_rng(11)
    # duplicate (user, ts) rows + single-event users
    frames = [
        pd.DataFrame(
            {"user_id": 1, "ts": pd.to_datetime(np.repeat([10**6, 5 * 10**9], 40), unit="us")}
        )
    ]
    for u in range(2, 30):
        frames.append(
            pd.DataFrame({"user_id": u, "ts": pd.to_datetime([int(rng.integers(10**9))], unit="us")})
        )
    df = pd.concat(frames, ignore_index=True).sample(frac=1, random_state=1)
    df = df.reset_index(drop=True)
    pd.testing.assert_frame_equal(_run(df, 23), _ref(df))


@pytest.mark.usefixtures("ray_session")
def test_sessionize_preserves_user_column_type():
    import pyarrow as pa
    import ray.data

    # stitched edge rows are typed from the interior schema: an int32
    # user column must not widen to int64 in the unioned edge table
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 2, 2, 3] * 40, pa.int32()),
            "ts": pa.array(
                (np.arange(200) * 10_000_000).astype("int64"), pa.timestamp("us")
            ),
        }
    )
    out = sessionize(ray.data.from_arrow(t).repartition(5))
    assert out.schema().base_schema.field("user_id").type == pa.int32()
    df = out.to_pandas()
    assert set(df["user_id"].tolist()) == {1, 2, 3}
