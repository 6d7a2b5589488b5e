"""Per-worker stage cache (functions/taskcache.py)."""

import pyarrow as pa

from rsmetacheck_ray.functions import taskcache
from rsmetacheck_ray.functions.taskcache import cached_stage


class _Stage:
    built = 0

    def __init__(self, tag):
        _Stage.built += 1
        self.tag = tag

    def __call__(self, batch):
        return batch.append_column("tag", pa.array([self.tag] * len(batch)))


def _b():
    return pa.table({"x": pa.array([1, 2], pa.int64())})


def test_stage_built_once_per_args_and_reused():
    taskcache._CACHE.clear()
    _Stage.built = 0
    fn = cached_stage(_Stage, "a")
    assert fn(_b()).column("tag").to_pylist() == ["a", "a"]
    fn(_b())
    assert _Stage.built == 1  # second batch reuses the cached stage


def test_new_args_evict_previous_execution():
    """One live entry per class: a later execution's fresh refs must
    evict the stale stage (a (cls, args)-keyed dict would pin every
    past execution's broadcast state in reused workers forever)."""
    taskcache._CACHE.clear()
    _Stage.built = 0
    cached_stage(_Stage, "a")(_b())
    cached_stage(_Stage, "b")(_b())
    assert _Stage.built == 2
    assert len(taskcache._CACHE) == 1  # keep-latest, not accumulate
    assert taskcache._CACHE[_Stage][1].tag == "b"
