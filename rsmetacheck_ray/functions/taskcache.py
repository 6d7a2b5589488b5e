"""Per-worker-process stage cache for broadcast-probe operators.

An actor-pool ``map_batches`` stage pays a pool spin-up (~0.5–1.5 s
measured) on EVERY query execution. For stages whose only state is a
``ray.get`` of a broadcast ref (a zero-copy plasma read the worker
process caches) plus cheap derived structures, plain TASKS with a
per-worker-process stage cache give the same loaded-once guarantee
with no spin-up: Ray task workers are reused across tasks, operators
and executions. This is the gate's ``_GATE_CACHE`` discipline
(pipelines/quality_gate.py) factored out for the operator library.

Actor pools remain the right tool when concurrency itself must be
bounded for an external resource (e.g. the URL-status stage's
politeness budget) or when state is too heavy to build per worker.
"""

from __future__ import annotations

# cls -> (args, stage): ONE live entry per stage class. Every query
# execution ray.puts fresh broadcast refs, so a (cls, args)-keyed dict
# would grow one never-evicted entry (pinning its plasma objects) per
# execution per reused worker — keep-latest evicts the previous
# execution's state the moment a new one shows up.
_CACHE: dict = {}


def _run(cls, args, batch):
    """Module-level cache lookup: the serialized stage fn references
    THIS function by module path, so the driver's ``_CACHE`` contents
    never ride along. (A closure reading ``_CACHE`` directly would
    make cloudpickle embed the dict's current contents — stale stage
    state, or an unimportable class cached by another caller — into
    every task payload.)"""
    entry = _CACHE.get(cls)
    if entry is None or entry[0] != args:
        entry = (args, cls(*args))
        _CACHE[cls] = entry
    return entry[1](batch)


def cached_stage(cls, *args):
    """A ``map_batches``-compatible FUNCTION that builds ``cls(*args)``
    once per worker process and reuses it for every batch of the SAME
    execution; a later execution's differing args evict the stale
    stage. ``args`` must be hashable (ObjectRefs are)."""

    def fn(batch, _cls=cls, _args=args):
        return _run(_cls, _args, batch)

    return fn
