"""Broadcast-side helpers for map_batches stages.

``ray.get`` of a plasma object that is NOT zero-copy deserializable
(a dict, a pandas DataFrame with object columns, a numpy object
array) re-unpickles the whole payload on EVERY call — per *batch*
inside a ``map_batches`` closure, which at a 2M-row broadcast guard
is seconds of pure deserialization per task. Pure-numeric numpy
arrays are the exception (plasma zero-copy views), and stages that
can express their broadcast as ``(sorted int64 keys, value array)``
pairs should do so and gather with ``np.searchsorted``.

For the payloads that genuinely hold Python strings (join frames,
text lookups), :func:`cached_get` memoizes the deserialized value
per worker process: the unpickle happens at most once per worker
(the same amortization an actor-pool ``__init__`` would give, but
without forcing a task stage onto actors), and every subsequent
batch pays one dict lookup.
"""

from __future__ import annotations

from collections import OrderedDict

# Bounded per-process memo: workers are reused across stages, so an
# unbounded cache would pin every broadcast a long-lived worker ever
# saw. 4 slots covers any single stage (one or two refs) with room
# for stage overlap; evicted refs simply re-deserialize once.
_CACHE_SLOTS = 4
_cache: OrderedDict = OrderedDict()


def cached_get(ref):
    """``ray.get(ref)`` memoized per worker process (LRU, 4 slots).

    Use for broadcast payloads that are not plasma-zero-copy (dicts,
    DataFrames, object arrays). The first call in a worker pays the
    deserialization; later batches on the same worker get the cached
    object. NEVER mutate the returned value — it is shared across
    every batch the worker processes.
    """
    import ray

    key = ref.hex()
    val = _cache.get(key)
    if val is None:
        val = ray.get(ref)
        _cache[key] = val
        if len(_cache) > _CACHE_SLOTS:
            _cache.popitem(last=False)
    else:
        _cache.move_to_end(key)
    return val
