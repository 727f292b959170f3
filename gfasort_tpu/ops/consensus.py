"""Banded node consensus: the sweep engines' only random-access op,
rebuilt as MXU matmuls.

Plain consensus is a scatter-mean + gather over ``[S]`` rows
(``xs -> x_node -> xs``), profiled at ~101 ms for S=4M on TPU v5e —
XLA element scatters/gathers cost ~12 ns *per row* regardless of width.
This module exploits pangenome locality instead: after any reasonable
sort, the node ids referenced by a tile of T consecutive steps span a
narrow window of the node space.  Per tile:

* the step->window reduction is a tiny matmul against a one-hot matrix
  built **in VMEM** from an iota compare (never materialized in HBM) —
  a Pallas kernel: ``[2, T] @ [T, W] -> [2, W]`` (sum row + count row);
* window->global merge uses *windowed* scatter-add (per-ROW cost: one
  row per tile, not one per element);
* the way back is a windowed row gather + the transpose matmul.

Steps whose node falls outside their tile's window are handled by a
small element-scatter fallback; the band coverage is computed at build
time so callers can fall back to plain scatter consensus when locality
is poor.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np

__all__ = ["BandedConsensus", "build_banded_consensus"]


@dataclass
class BandedConsensus:
    """Callable pair: reduce(xs) -> x_node and broadcast(x_node) -> xs."""

    consensus: object          # (xs [S]) -> (xs_new [S], x_node [N])
    coverage: float            # fraction of steps in-band
    tile: int
    window: int


def build_banded_consensus(
    step_node: np.ndarray,      # [S] node index per step (>= 0)
    n_nodes: int,
    tile: int = 256,
    window: int = 512,
    interpret: Optional[bool] = None,
):
    """Build the banded consensus for a static step->node map.

    Returns a :class:`BandedConsensus`; ``consensus.consensus(xs)``
    is jit-safe (pure function of xs).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    S = int(step_node.shape[0])
    N = int(n_nodes)
    T = tile
    W = window
    n_tiles = -(-S // T)
    S_pad = n_tiles * T

    node_pad = np.full(S_pad, -1, dtype=np.int64)
    node_pad[:S] = step_node
    tiles = node_pad.reshape(n_tiles, T)

    # per-tile window base: median-centered (robust to outlier jumps —
    # a min-based base lets one wild node push the whole tile out of
    # band), clamped to [0, N-W]
    bases = np.zeros(n_tiles, dtype=np.int32)
    for b in range(n_tiles):
        live = tiles[b][tiles[b] >= 0]
        if len(live):
            mid = int(np.median(live))
            bases[b] = min(max(mid - W // 2, 0), max(N - W, 0))
    lidx = tiles - bases[:, None]
    in_band = (tiles >= 0) & (lidx >= 0) & (lidx < W)
    lidx = np.where(in_band, lidx, -1).astype(np.int32)
    coverage = float(in_band.sum()) / max(S, 1)

    # out-of-band fallback (static index lists)
    oob_mask = (~in_band) & (tiles >= 0)
    oob_flat = np.flatnonzero(oob_mask.reshape(-1))
    oob_steps = oob_flat.astype(np.int32)              # indices into padded xs
    oob_nodes = node_pad[oob_flat].astype(np.int32)

    lidx_j = jnp.asarray(lidx)                          # [b, T]
    bases_j = jnp.asarray(bases)                        # [b]
    oob_steps_j = jnp.asarray(oob_steps)
    oob_nodes_j = jnp.asarray(oob_nodes)
    n_oob = len(oob_steps)

    # ---------------- Pallas kernels ----------------
    def reduce_kernel(lidx_ref, xs_ref, out_ref):
        """[T] steps -> [2, W] (sum, count) via MXU one-hot matmul."""
        li = lidx_ref[0]                                # [T] int32
        xs = xs_ref[0]                                  # [T] f32
        onehot = (
            li[:, None] == jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
        ).astype(jnp.float32)                           # [T, W]
        v = jnp.stack([xs, (li >= 0).astype(jnp.float32)])  # [2, T]
        out_ref[0] = jnp.dot(v, onehot, preferred_element_type=jnp.float32)

    def expand_kernel(lidx_ref, win_ref, out_ref):
        """[W] window values -> [T] per-step values (transpose side)."""
        li = lidx_ref[0]
        win = win_ref[0]                                # [W]
        onehot = (
            li[:, None] == jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
        ).astype(jnp.float32)
        out_ref[0] = jnp.dot(
            onehot, win[:, None], preferred_element_type=jnp.float32
        )[:, 0]

    reduce_call = pl.pallas_call(
        reduce_kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 2, W), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, T), lambda b: (b, 0)),
            pl.BlockSpec((1, T), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, W), lambda b: (b, 0, 0)),
        interpret=interpret,
    )

    expand_call = pl.pallas_call(
        expand_kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, T), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, T), lambda b: (b, 0)),
            pl.BlockSpec((1, W), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((1, T), lambda b: (b, 0)),
        interpret=interpret,
    )

    # windowed scatter-add: [b, W] updates at row starts bases [b]
    import jax.lax as lax

    scatter_dnums = lax.ScatterDimensionNumbers(
        update_window_dims=(1,),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,),
    )
    gather_dnums = lax.GatherDimensionNumbers(
        offset_dims=(1,),
        collapsed_slice_dims=(),
        start_index_map=(0,),
    )

    def consensus(xs):
        """xs [S] (f32/f64) -> (xs_new [S], x_node [N])."""
        dt = xs.dtype
        xs_pad = jnp.zeros(S_pad, jnp.float32).at[:S].set(
            xs.astype(jnp.float32)
        )
        xs_tiles = xs_pad.reshape(n_tiles, T)
        win = reduce_call(lidx_j, xs_tiles)             # [b, 2, W]

        npad = N + W
        idx = bases_j[:, None].astype(jnp.int32)        # [b, 1]
        ssum = lax.scatter_add(
            jnp.zeros(npad, jnp.float32), idx, win[:, 0, :],
            scatter_dnums, indices_are_sorted=False, unique_indices=False,
        )
        scnt = lax.scatter_add(
            jnp.zeros(npad, jnp.float32), idx, win[:, 1, :],
            scatter_dnums, indices_are_sorted=False, unique_indices=False,
        )
        if n_oob:
            ssum = ssum.at[oob_nodes_j].add(xs_pad[oob_steps_j])
            scnt = scnt.at[oob_nodes_j].add(1.0)
        x_node = (ssum / jnp.maximum(scnt, 1))[:N]

        # back: windowed row gather + expand matvec
        xwin = lax.gather(
            jnp.concatenate([x_node, jnp.zeros(W, x_node.dtype)]),
            idx, gather_dnums, slice_sizes=(W,),
        )                                               # [b, W]
        xs_new_tiles = expand_call(lidx_j, xwin)        # [b, T]
        xs_new = xs_new_tiles.reshape(S_pad)
        if n_oob:
            xs_new = xs_new.at[oob_steps_j].set(x_node[oob_nodes_j])
        # pad slots / any remaining zero-band slots keep old values
        live = jnp.asarray((node_pad >= 0))
        xs_new = jnp.where(live, xs_new, xs_pad)
        return xs_new[:S].astype(dt), x_node.astype(dt)

    return BandedConsensus(
        consensus=consensus, coverage=coverage, tile=T, window=W
    )
