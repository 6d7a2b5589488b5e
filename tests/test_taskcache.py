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


class _PoisonStage:
    """Module-level: cloudpickle serializes it BY REFERENCE to this
    test module, which Ray workers cannot import — exactly the shape
    of any driver-side cache entry from a non-worker-importable
    module."""

    def __call__(self, batch):
        return batch


def test_driver_cache_contents_never_ship_to_workers(ray_session):
    """The stage fn must reference the cache via the module, not embed
    its contents: a driver-side cache entry whose class is unimportable
    on workers must not break the serialization of an unrelated Ray
    stage (regression: the closure once captured _CACHE by value)."""
    import pyarrow as pa
    import ray.data as rd

    _LocalOnly = _PoisonStage
    taskcache._CACHE[_LocalOnly] = ((), _LocalOnly())

    class _AddOne:
        def __init__(self):
            pass

        def __call__(self, batch):
            import pyarrow.compute as pc

            return batch.set_column(
                0, "x", pc.add(batch.column("x"), 1)
            )

    try:
        ds = rd.from_arrow(pa.table({"x": pa.array([1, 2], pa.int64())}))
        out = ds.map_batches(
            cached_stage(_AddOne), batch_format="pyarrow"
        ).to_pandas()
        assert out["x"].tolist() == [2, 3]
    finally:
        taskcache._CACHE.pop(_LocalOnly, None)
