"""gfasort_tpu — a TPU-native pangenome graph sorting and layout engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``pangenome/gfasort`` (Rust): path-guided 1D SGD sort, nD layout SGD,
grooming, topological sorts, and unchop over bidirected GFA graphs.

Architecture (tpu-first, not a port):

* **Host graph kernel** (:mod:`.graph`, :mod:`.io.gfa`) — NumPy
  struct-of-arrays graph with the reference's exact mutation semantics.
* **Host graph algorithms** (:mod:`.algos`) — deterministic O(E)
  frontier/heap implementations of the reference's quadratic passes.
* **Device SGD engines** (:mod:`.ops`) — batched synchronous rounds of
  Zipfian term sampling + distance-residual updates, compiled with
  ``jit``/Pallas over HBM-resident position and path-index arrays,
  replacing the reference's Hogwild atomics.
* **Multi-chip scaling** (:mod:`.parallel`) — path-step arrays sharded
  over a ``jax.sharding.Mesh``, positions replicated, per-round deltas
  merged with ``psum``.
* **Oracle** (:mod:`.ops.exact`, :mod:`.native`) — a bit-exact
  sequential replica of the reference semantics (Xoshiro256Plus RNG,
  Lemire uniform ints, ``fast_precise_pow``) used for parity goldens
  and as the CPU baseline.
"""

from .graph import BiPath, BidirectedGraph
from .index import PathIndex
from .io.layout_tsv import Layout
from .params import LayoutSGDParams, PathSGDParams, YgsParams

__version__ = "0.1.0"

__all__ = [
    "BiPath",
    "BidirectedGraph",
    "PathIndex",
    "Layout",
    "PathSGDParams",
    "LayoutSGDParams",
    "YgsParams",
]
