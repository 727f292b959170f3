"""Device compute path: SGD engines, sampling, schedules, metrics.

Two engines implement each SGD (1D sort, nD layout):

* :mod:`.exact` — the sequential **oracle**: a bit-exact replica of the
  reference's single-thread semantics (Xoshiro256Plus RNG stream,
  Lemire rejection uniforms, ``fast_precise_pow`` Zipf) with the
  deterministic iteration contract (exactly ``min_term_updates``
  successful updates per iteration).  Used for parity goldens and
  correctness tests; a C++ twin lives in :mod:`gfasort_tpu.native`.
* :mod:`.sgd` — the **TPU engine**: batched synchronous rounds compiled
  with ``jit``; per round it samples B term pairs, computes
  distance-residual deltas against a position snapshot, and merges them
  with a scatter-add, replacing the reference's Hogwild atomics
  (SURVEY.md §2 "Parallelism & communication" table).
"""

from .schedule import eta_schedule  # noqa: F401
from .fastpow import fast_precise_pow, zeta_table  # noqa: F401
