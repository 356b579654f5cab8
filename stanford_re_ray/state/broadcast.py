"""Broadcast-state helpers.

``ray.put`` once on the driver, fetch zero-copy in every task via
``fetch(ref)``.  A per-worker-process cache avoids re-deserializing the same
object for every task the worker runs (worker processes are reused across
tasks, so the cache amortizes like actor state — without pinning CPUs the
way a fixed actor pool does).

This is the mapping for all of the reference's load-once-per-JVM state
(SURVEY.md §2.3): word-cluster map (FeatureFactory.java:65-78), gazetteers
(WorldKnowledgePostProcessor.java:27-115), classifier weights
(SlotfillingSystem.java:87-111), the training KB (KnowledgeBase.java:10-44).
"""

from __future__ import annotations

from typing import Any

_CACHE: dict[str, Any] = {}


def fetch(ref):
    """Resolve a broadcast handle: plain objects pass through; ObjectRefs are
    ray.get'd once per worker process and cached."""
    if ref is None:
        return None
    try:
        import ray

        if isinstance(ref, ray.ObjectRef):
            key = ref.hex()
            if key not in _CACHE:
                _CACHE[key] = ray.get(ref)
            return _CACHE[key]
    except ImportError:
        pass
    return ref


def put(obj):
    """ray.put wrapper (driver side)."""
    import ray

    return ray.put(obj)
