"""Per-worker-process state cache for task-pool stages.

Ray Data map tasks run in reusable worker processes, so a module-level
cache gives "build once per worker" semantics WITHOUT an actor pool —
the same prepared-state guarantee as a callable-class stage, minus the
actor cold-start (NOTES perf lesson 5: pools autoscale slowly; short
stages pay seconds of spin-up). Use for broadcast indexes keyed by
their ObjectRef hex; entries are evicted LRU beyond a small bound so a
long-lived worker serving many different broadcasts stays bounded.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Callable

_CACHE: "OrderedDict[str, Any]" = OrderedDict()
_MAX_ENTRIES = 8


def get_or_build(key: str, builder: Callable[[], Any]) -> Any:
    hit = _CACHE.get(key)
    if hit is not None:
        _CACHE.move_to_end(key)
        return hit
    val = builder()
    _CACHE[key] = val
    if len(_CACHE) > _MAX_ENTRIES:
        _CACHE.popitem(last=False)
    return val
