"""Banded node consensus: factorized one-hot MXU contractions over
per-tile windows.

SUPERSEDED by :mod:`gfasort_tpu.ops.grid_consensus` (round 2), which
keeps the factorized dots but constrains windows to uniform-stride
grids so the window<->node merge becomes slice arithmetic.  Measured
at S=4M on TPU v5e: this module ~67 ms end-to-end (the arbitrary-base
[g, W] row scatter alone costs ~30 ms — XLA serializes non-unique row
scatters at ~2 us/row — and the row gather ~15 ms), the grid version
~16 ms, plain gather-sum ~64 ms.  Kept as the measured intermediate
design step; not wired into any engine.

Plain consensus is a scatter-mean + gather over ``[S]`` rows
(``xs -> x_node -> xs``), profiled at ~68 ms in-loop for S=4M on TPU
v5e (with the static count hoisted) — XLA element scatters/gathers cost
~12-15 ns *per row* regardless of width.  This module exploits
pangenome locality instead: after any reasonable sort, the node ids
referenced by a tile of T consecutive steps span a narrow window of the
node space.

The step->window reduction is a one-hot contraction, but the one-hot is
never materialized at full width: with ``li = hi*128 + lo`` the window
one-hot factorizes as ``onehot(li) = onehot_hi (x) onehot_lo``, so

    wsum[hi*128+lo] = sum_t oh_hi[t,hi] * (oh_lo[t,lo] * xs[t])

is a batched ``[Wh,T] @ [T,128]`` contraction per tile (Wh = W/128) —
real MXU shapes with only ``T*(128+Wh)`` one-hot materialization per
tile instead of the ``T*W`` a naive one-hot costs.  The way back
selects window rows with the same two factors.  Per-node counts are
static and precomputed on the host, so only sums move through the op.

An earlier revision implemented the contractions as hand-written Pallas
kernels; measured per-tile Mosaic overhead (grid sequencing, one-hot
iota construction) made them 2.6-3.3x SLOWER than plain scatter.  The
shipped version is pure XLA (``dot_general`` batched over tiles), which
tiles the MXU work itself: ~11 ms at S=4M vs 68 ms for plain scatter.

Window->global merge uses *windowed* row scatter-add (one row per tile,
not one element per step); the way back is a windowed row gather.
Steps whose node falls outside their tile's window are handled by a
small element-scatter fallback; the band coverage is reported so
callers can fall back to plain scatter consensus when locality is poor.

The static arrays (window-local indices, tile bases) are exposed on the
result so hot loops can pass them as jit *arguments* — multi-MB baked
constants have crashed the remote-compile client.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

__all__ = ["BandedConsensus", "build_banded_consensus"]

_LANE = 128  # TPU lane width; the `lo` factor of the index split


@dataclass
class BandedConsensus:
    consensus: object          # (xs [S]) -> (xs_new [S], x_node [N])
    fn: object                 # (xs, lidx, bases, inv_cnt) -> same
    arrays: tuple              # (lidx [n_tiles,T] i32, bases [n_tiles] i32, inv_cnt [N])
    coverage: float
    tile: int
    window: int


def build_banded_consensus(
    step_node: np.ndarray,      # [S] node index per step (>= 0)
    n_nodes: int,
    tile: int = 256,
    window: Optional[int] = None,
    interpret: Optional[bool] = None,  # kept for API compat (unused)
):
    """Build the banded consensus for a static step->node map."""
    import jax
    import jax.numpy as jnp
    import jax.lax as lax

    S = int(step_node.shape[0])
    N = int(n_nodes)
    T = tile
    n_tiles = -(-S // T)
    S_pad = n_tiles * T

    node_pad = np.full(S_pad, -1, dtype=np.int64)
    node_pad[:S] = step_node
    tiles = node_pad.reshape(n_tiles, T)

    live_t = tiles >= 0
    big = np.where(live_t, tiles, np.iinfo(np.int64).max)
    mins = big.min(axis=1)
    mins = np.where(mins == np.iinfo(np.int64).max, 0, mins)
    small = np.where(live_t, tiles, -1)
    maxs = small.max(axis=1)
    spans = np.maximum(maxs - mins + 1, 1)

    if window is None:
        # cover ~99% of tiles exactly; stragglers (notably tiles that
        # straddle a path boundary, whose span is unbounded) go to the
        # element fallback instead of inflating the window
        window = int(np.percentile(spans, 99.0)) + 1
    # round up to the lane width so li = hi*LANE + lo tiles exactly
    W = max(-(-int(window) // _LANE) * _LANE, _LANE)
    Wh = W // _LANE

    bases = np.clip(mins, 0, max(N - W, 0)).astype(np.int32)
    lidx = tiles - bases[:, None]
    in_band = live_t & (lidx >= 0) & (lidx < W)
    lidx = np.where(in_band, lidx, -1).astype(np.int32)
    coverage = float(in_band.sum()) / max(S, 1)

    oob_mask = (~in_band) & live_t
    oob_flat = np.flatnonzero(oob_mask.reshape(-1))
    oob_steps_j = jnp.asarray(oob_flat.astype(np.int32))
    oob_nodes_j = jnp.asarray(node_pad[oob_flat].astype(np.int32))
    n_oob = len(oob_flat)

    # static per-node counts (includes oob steps)
    cnt = np.bincount(step_node.astype(np.int64), minlength=N).astype(np.float64)
    inv_cnt_np = (1.0 / np.maximum(cnt, 1.0)).astype(np.float32)
    live_j = jnp.asarray(node_pad >= 0)

    lidx_j = jnp.asarray(lidx)                          # [n_tiles, T]
    bases_j = jnp.asarray(bases)                        # [n_tiles]
    inv_cnt_j = jnp.asarray(inv_cnt_np)                 # [N]

    HIGH = jax.lax.Precision.HIGHEST

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

    def fn(xs, lidx_a, bases_a, inv_cnt_a):
        """xs [S] -> (xs_new [S], x_node [N]); matches plain
        scatter-mean consensus (oob fallback covers stragglers).
        Static arrays are passed as arguments for hot-loop use."""
        dt = xs.dtype
        xs_pad = jnp.zeros(S_pad, jnp.float32).at[:S].set(
            xs.astype(jnp.float32)
        )
        xs_t = xs_pad.reshape(n_tiles, T)

        # factorized one-hots; lidx == -1 (oob/dead) has hi == -1 which
        # matches no window row, so those steps contribute nothing
        lo = jax.lax.broadcasted_iota(jnp.int32, (n_tiles, T, _LANE), 2)
        oh_lo = (lidx_a[:, :, None] & (_LANE - 1)) == lo    # [g, T, LANE]
        a = jnp.where(oh_lo, xs_t[:, :, None], 0.0)          # [g, T, LANE]
        hi = jax.lax.broadcasted_iota(jnp.int32, (n_tiles, Wh, T), 1)
        oh_hi = ((lidx_a[:, None, :] >> 7) == hi).astype(jnp.float32)
        wsum = jax.lax.dot_general(
            oh_hi, a,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=HIGH,
        ).reshape(n_tiles, W)                                # [g, W]

        npad = N + W
        idx = bases_a[:, None].astype(jnp.int32)             # [g, 1]
        ssum = lax.scatter_add(
            jnp.zeros(npad, jnp.float32), idx, wsum,
            scatter_dnums, indices_are_sorted=False, unique_indices=False,
        )
        if n_oob:
            ssum = ssum.at[oob_nodes_j].add(xs_pad[oob_steps_j])
        x_node = ssum[:N] * inv_cnt_a

        xwin = lax.gather(
            jnp.concatenate([x_node, jnp.zeros(W, x_node.dtype)]),
            idx, gather_dnums, slice_sizes=(W,),
        ).reshape(n_tiles, Wh, _LANE)                        # [g, Wh, LANE]
        b1 = jax.lax.dot_general(
            oh_hi, xwin,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=HIGH,
        )                                                    # [g, T, LANE]
        xs_new = jnp.sum(jnp.where(oh_lo, b1, 0.0), axis=2).reshape(S_pad)
        if n_oob:
            xs_new = xs_new.at[oob_steps_j].set(x_node[oob_nodes_j])
        xs_new = jnp.where(live_j, xs_new, xs_pad)
        return xs_new[:S].astype(dt), x_node.astype(dt)

    def consensus(xs):
        return fn(xs, lidx_j, bases_j, inv_cnt_j)

    return BandedConsensus(
        consensus=consensus, fn=fn,
        arrays=(lidx_j, bases_j, inv_cnt_j),
        coverage=coverage, tile=T, window=W,
    )
