"""Session-scoped Ray fixture — Ray is initialised ONCE per pytest
session (driver contract), never per test/module."""

from __future__ import annotations

import logging

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    """Cached deterministic 2000-row corpus (pages dir, labels path)."""
    from rsmetacheck_ray.datagen import corpus_dir

    return corpus_dir(2000, n_files=4)
