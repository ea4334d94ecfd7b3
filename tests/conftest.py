"""Session-scoped Ray fixture: init ONCE per pytest session."""

from __future__ import annotations

import os

# See tokcodec.__init__._disable_numpy_thp_madvise: THP first-touch
# faults are pathologically slow on this sandbox; env var covers any
# worker process that imports numpy before tokcodec.
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_parquet(tmp_path_factory):
    """Small deterministic tokenized table written as Parquet (F1 'small')."""
    from tokcodec.synth import write_fixture

    path = str(tmp_path_factory.mktemp("fixtures") / "tokens_small.parquet")
    return write_fixture(path, n_rows=5000, seed=42, row_group_size=512)
