"""In-process runner memoization for the warm-process server.

A fresh `build_sweep_runner` per CLI job re-traces the engine and
re-loads the cached executable through the remote backend — measured
~20 s per job even with every persistent-cache entry warm (the jit
cache is keyed by the FUNCTION OBJECT, which a rebuild replaces).
The warm server (gfasort_tpu/server.py) sets
``GFASORT_RUNNER_CACHE=1`` so the engine builders memoize the whole
built runner — jitted programs, device-resident static arrays,
consensus plan — keyed by a content fingerprint of the workload plus
every structure-affecting parameter.  A same-workload job then costs
only the fingerprint hash (~0.3 s at 4M steps) and the dispatch.

Not enabled by default: the cache pins device arrays alive for the
process lifetime (bounded by ``GFASORT_RUNNER_CACHE_CAP`` entries,
default 4, LRU).
"""

from __future__ import annotations

import hashlib
import os
from collections import OrderedDict

import numpy as np

__all__ = ["enabled", "fingerprint_pidx", "params_key", "env_key",
           "get", "put"]

_CACHE: OrderedDict = OrderedDict()


def enabled() -> bool:
    return os.environ.get("GFASORT_RUNNER_CACHE", "0") == "1"


def _cap() -> int:
    return max(1, int(os.environ.get("GFASORT_RUNNER_CACHE_CAP", 4)))


def fingerprint_pidx(pidx) -> str:
    """Content hash of every PathIndex array a runner's structure or
    static device arrays can depend on."""
    h = hashlib.sha256()
    for a in (pidx.step_node_idx, pidx.step_pos, pidx.step_rank,
              pidx.step_count_of_step, pidx.step_path, pidx.path_count,
              pidx.node_len, pidx.node_ids):
        a = np.ascontiguousarray(a)
        h.update(str(a.dtype).encode())
        h.update(a.tobytes())
    return h.hexdigest()


def params_key(params) -> tuple:
    """Structure-affecting parameter fields (seed excluded: it enters
    at run time as the base key, not at build time)."""
    return tuple(
        (f, getattr(params, f))
        for f in ("iter_max", "min_term_updates", "eta_max", "theta",
                  "space", "space_max", "space_quantization_step", "eps",
                  "first_cooling_iteration", "iter_with_max_learning_rate",
                  "dtype")
        if hasattr(params, f)
    )


def env_key() -> tuple:
    """Every GFASORT_* env knob that can alter a built runner."""
    return tuple(sorted(
        (k, v) for k, v in os.environ.items()
        if k.startswith("GFASORT_") and k not in (
            "GFASORT_RUNNER_CACHE", "GFASORT_RUNNER_CACHE_CAP",
            "GFASORT_SERVER_SOCKET", "GFASORT_SERVER_IDLE_S",
            "GFASORT_IN_SERVER", "GFASORT_COMPILE_CACHE",
        )
    ))


def get(key):
    hit = _CACHE.get(key)
    if hit is not None:
        _CACHE.move_to_end(key)
    return hit


def put(key, value) -> None:
    _CACHE[key] = value
    _CACHE.move_to_end(key)
    while len(_CACHE) > _cap():
        _CACHE.popitem(last=False)
