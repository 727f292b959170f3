"""Grid consensus: banded one-hot MXU consensus on uniform-stride grids.

The sweep engines' node consensus (mean over each node's steps, written
back to every step) is their only random-access op.  Three generations,
all measured at S=4M / N=1M on TPU v5e (slope timing):

* scatter-mean + gather                    ~68 ms
* gather-sum over degree classes           ~64 ms  (ops/node_sum.py)
* banded one-hot dots, per-tile windows    ~67 ms  (ops/consensus.py) —
  the dots are cheap (~6 ms each) but merging overlapping [g, W]
  windows into node space costs 30 ms (row scatter) + 15 ms (row
  gather): XLA serializes non-unique row scatters at ~2 us/row.
* THIS MODULE: windows on uniform-stride grids             ~15-17 ms.

The trick: constrain every tile's window base to a uniform grid
``base_j = anchor_seg + (j - j_seg) * D`` over fixed-length segments of
``SL`` tiles.  The window->node merge then becomes overlap-add with a
FIXED stride — ``W/D`` dense slice-adds per segment — and the
node->window fetch is ``W/D`` shifted reshapes.  Both run at HBM
bandwidth (measured 0.6 ms vs 38 ms for the row scatter); no data-
dependent scatter or gather survives in the hot path.  Steps whose node
misses its tile's window go through an exact element-scatter fallback;
the builder reports ``coverage`` so callers can fall back to the
gather-sum consensus entirely when locality is poor (ops/sweep.py holds
the selection policy).

Pangenome locality makes the grid fit: after any reasonable sort (or
GFA construction order), a path's node ids grow roughly linearly with
step rank, so per-segment anchoring reaches >99% coverage on
chromosome-scale workloads.

Step->window reduction and window->step broadcast are factorized
one-hot contractions (``li = hi*128 + lo`` gives ``onehot(li) =
onehot_hi (x) onehot_lo``), batched on the MXU; f32 dots at HIGHEST
precision measured as fast as manual bf16 splitting and keep products
exact (one-hot entries are exactly 1.0).

Design properties the sweep engines rely on:
* anchors/lidx/oob tables are jit ARGUMENTS (no multi-MB baked
  constants; one compiled program serves every graph of the same
  padded shape),
* fixed segment structure + dynamic anchors works unchanged inside
  ``shard_map`` (per-device anchor arrays, psum between fwd and bwd),
* multi-row input [R, S] shares the one-hot work across rows (the nD
  layout engine runs R = 2*dims rows per consensus).

Together with the sweep schedule this replaces the reference's Hogwild
position sharing (/root/reference/src/sgd.rs:573-576).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

__all__ = ["GridConsensus", "GridPlan", "plan_grid", "build_grid_consensus"]

_LANE = 128  # TPU lane width; the `lo` factor of the window index split


@dataclass
class GridPlan:
    """Host-side static plan for one step array (device arrays not yet
    materialized; shard builders stack several plans)."""
    lidx: np.ndarray        # [g, T] window-local node index, -1 = oob/dead
    anchors: np.ndarray     # [n_seg] i32 grid anchor per segment
    oob_steps: np.ndarray   # [n_oob_pad] i32 padded step idx (sentinel S_pad)
    oob_nodes: np.ndarray   # [n_oob_pad] i32 padded node idx (sentinel N)
    coverage: float
    S: int
    S_pad: int


def choose_grid_geometry(
    step_node: np.ndarray,
    tile: int,
    seg_tiles: int,
    max_window: int,
    path_of_step: Optional[np.ndarray] = None,
) -> tuple:
    """Pick (D, W, m) from tile-min statistics: stride = median per-tile
    node advance (lane-rounded), window = stride + typical span + the
    measured anchor drift within a segment.  Straddler tiles (span too
    large to ever fit — e.g. tiles crossing a path boundary) are
    excluded from the stats; they go through the element fallback."""
    S = int(step_node.shape[0])
    T = int(tile)
    g = -(-S // T)
    node_pad = np.full(g * T, -1, dtype=np.int64)
    node_pad[:S] = step_node
    tiles = node_pad.reshape(g, T)
    live_t = tiles >= 0
    live_tile = live_t.any(axis=1)
    if not live_tile.any():
        return _LANE, 2 * _LANE, 2
    big = np.where(live_t, tiles, np.iinfo(np.int64).max)
    mins = np.where(live_tile, big.min(axis=1), 0)
    maxs = np.where(live_t, tiles, -1).max(axis=1)
    spans = np.maximum(maxs - mins + 1, 1)

    span_p90 = float(np.percentile(spans[live_tile], 90.0))
    ok = live_tile & (spans <= 2 * span_p90 + _LANE)  # non-straddlers
    if path_of_step is not None:
        # drift/stride stats must not mix tiles across path restarts
        pp = np.full(g * T, -1, dtype=np.int64)
        pp[:S] = path_of_step
        tp = pp.reshape(g, T)
        first_live = np.argmax(live_t, axis=1)
        tile_path = np.where(live_tile, tp[np.arange(g), first_live], -1)
        same_path = np.ones(g, dtype=bool)
        same_path[1:] = tile_path[1:] == tile_path[:-1]
        ok = ok & same_path

    dm = np.diff(mins)
    dl = dm[ok[1:] & ok[:-1]]
    dl = dl[dl >= 0]
    stride_med = float(np.median(dl)) if len(dl) else 0.0
    D = max(int(round(stride_med / _LANE)) * _LANE, _LANE)

    span_p99 = float(np.percentile(spans[ok], 99.0)) if ok.any() else 1.0
    # measured per-segment anchor drift: spread of (min_j - j_rel*D)
    # within each segment, grouped per path so a mid-segment path
    # restart (rel jumps by ~N) does not inflate the stat — mixed
    # segments get a majority-piece anchor in plan_grid instead
    n_seg = -(-g // seg_tiles)
    rel = mins - (np.arange(g, dtype=np.int64) % seg_tiles) * D
    seg_of_tile = np.arange(g) // seg_tiles
    if path_of_step is not None:
        grp_path = tile_path
    else:
        grp_path = np.zeros(g, dtype=np.int64)
    sel = ok & (grp_path >= 0)
    if sel.any():
        keys = seg_of_tile[sel] * (int(grp_path.max()) + 2) + grp_path[sel]
        _, inv = np.unique(keys, return_inverse=True)
        ngrp = int(inv.max()) + 1
        gmin = np.full(ngrp, np.iinfo(np.int64).max)
        gmax = np.full(ngrp, np.iinfo(np.int64).min)
        np.minimum.at(gmin, inv, rel[sel])
        np.maximum.at(gmax, inv, rel[sel])
        drift = (gmax - gmin).astype(np.float64)
        drift_p99 = float(np.percentile(drift, 99.0)) if len(drift) else 0.0
    else:
        drift_p99 = 0.0

    # NOTE: plan_grid floors anchors to the D-grid (placement-dot
    # merge), consuming up to D-1 of top-edge window headroom.  The D
    # term below covers it in the common case; measured on the bench /
    # cert workloads the flooring changes coverage by exactly 0 (the
    # binding loss is span-straddler tiles, which no window fits), and
    # the coverage>=0.97 fallback in ops/sweep.select_consensus guards
    # the rest.
    m = max(2, -(-int(D + span_p99 + drift_p99 + _LANE) // D))
    m = min(m, max(2, max_window // D))
    return D, m * D, m


def plan_grid(
    step_node: np.ndarray,      # [S] node index per step (>= 0)
    n_nodes: int,
    tile: int,
    seg_tiles: int,
    D: int,
    W: int,
    n_seg: Optional[int] = None,     # pad segment count (shard stacking)
    n_oob_pad: Optional[int] = None,  # pad oob count (shard stacking)
    path_of_step: Optional[np.ndarray] = None,
) -> GridPlan:
    """Lay one step array onto the (D, W) grid with fixed-length
    segments of ``seg_tiles`` tiles: per segment the anchor is the best
    (largest safe) base so every live tile's window starts at or below
    its min node; tiles that still miss go to the element fallback.

    A path boundary inside a segment makes one anchor impossible for
    both sides (the next path restarts near node 0); with
    ``path_of_step`` given, such segments pick the candidate anchor
    that covers the most tiles instead of the poisoned global min
    (measured on the bench workload: coverage 96.9% -> 99.8%)."""
    S = int(step_node.shape[0])
    N = int(n_nodes)
    T = int(tile)
    g = -(-S // T)
    S_pad = g * T

    node_pad = np.full(S_pad, -1, dtype=np.int64)
    node_pad[:S] = step_node
    tiles = node_pad.reshape(g, T)
    live_t = tiles >= 0
    live_tile = live_t.any(axis=1)
    big = np.where(live_t, tiles, np.iinfo(np.int64).max)
    mins = np.where(live_tile, big.min(axis=1), np.iinfo(np.int64).max)
    maxs = np.where(live_t, tiles, -1).max(axis=1)

    nseg_real = -(-g // seg_tiles)
    g_pad = nseg_real * seg_tiles
    # anchor_k = min over non-straddler live tiles of
    # (min_j - (j - js)*D): the highest grid that still starts at or
    # below every such tile's min.  Straddlers (tiles whose span cannot
    # fit any window, e.g. across a path boundary) are excluded so one
    # bad tile does not push a whole segment out of band.
    spans = maxs - mins + 1
    ok = live_tile & (spans <= W - D)
    rel = mins - (np.arange(g, dtype=np.int64) % seg_tiles) * D
    rel_m = np.where(ok, rel, np.iinfo(np.int64).max)
    rel_pad = np.full(g_pad, np.iinfo(np.int64).max, dtype=np.int64)
    rel_pad[:g] = rel_m
    anchors = rel_pad.reshape(nseg_real, seg_tiles).min(axis=1)
    anchors = np.where(anchors == np.iinfo(np.int64).max, 0, anchors)

    if path_of_step is not None:
        # path id per tile (first live step's path) -> per-segment
        # boundary detection
        pp = np.full(S_pad, -1, dtype=np.int64)
        pp[:S] = path_of_step
        tp = pp.reshape(g, T)
        first_live = np.argmax(live_t, axis=1)
        tile_path = tp[np.arange(g), first_live]
        tile_path = np.where(live_tile, tile_path, -1)
        tp_pad = np.full(g_pad, -1, dtype=np.int64)
        tp_pad[:g] = tile_path
        tp_seg = tp_pad.reshape(nseg_real, seg_tiles)
        lo = np.where(tp_seg >= 0, tp_seg, np.iinfo(np.int64).max).min(axis=1)
        hi = tp_seg.max(axis=1)
        mixed = np.flatnonzero((hi >= 0) & (lo != hi))  # >1 path in segment
        rel_seg = rel_pad.reshape(nseg_real, seg_tiles)
        mins_pad = np.full(g_pad, 0, dtype=np.int64)
        mins_pad[:g] = np.where(live_tile, mins, 0)
        maxs_pad = np.full(g_pad, -1, dtype=np.int64)
        maxs_pad[:g] = maxs
        ok_pad = np.zeros(g_pad, dtype=bool)
        ok_pad[:g] = ok
        jrel = (np.arange(g_pad) % seg_tiles).astype(np.int64)
        for k in mixed:
            sl = slice(k * seg_tiles, (k + 1) * seg_tiles)
            cands = np.unique(rel_seg[k][rel_seg[k] != np.iinfo(np.int64).max])
            if len(cands) == 0:
                continue
            best_a, best_n = anchors[k], -1
            for a in cands:
                base = a + jrel[sl] * D
                fit = ok_pad[sl] & (mins_pad[sl] >= base) & (maxs_pad[sl] < base + W)
                n_fit = int(fit.sum())
                if n_fit > best_n:
                    best_a, best_n = a, n_fit
            anchors[k] = best_a

    # anchors are stored SHIFTED by the static front pad OFF =
    # seg_tiles*D so mixed segments may anchor below node 0 (a path
    # restarting mid-segment needs base_j = a + j_rel*D with a < 0);
    # clamp into the padded buffer [0, OFF + N].
    # r4: anchors are floored to the D-grid so the window->node merge
    # can run as a one-hot PLACEMENT DOT over whole D-rows instead of
    # per-segment dynamic slices (callers grow W by D to keep the
    # upper window edge covered; see make_grid_fns).  Flooring only
    # lowers bases, so coverage cannot drop.
    OFF = seg_tiles * D
    anchors = (anchors // D) * D
    anchors = np.clip(anchors, -OFF, (N // D) * D).astype(np.int64)

    seg_of_tile = np.arange(g) // seg_tiles
    bases = anchors[seg_of_tile] + (
        np.arange(g, dtype=np.int64) % seg_tiles
    ) * D
    anchors = (anchors + OFF).astype(np.int32)  # buffer coordinates

    lidx = tiles - bases[:, None]
    in_band = live_t & (lidx >= 0) & (lidx < W)
    lidx = np.where(in_band, lidx, -1).astype(np.int32)
    coverage = float(in_band.sum()) / max(S, 1)

    oob_mask = (~in_band) & live_t
    oob_flat = np.flatnonzero(oob_mask.reshape(-1)).astype(np.int32)
    n_oob = len(oob_flat)
    if n_oob_pad is None:
        # bucket to powers of two for compile-cache reuse
        n_oob_pad = 1 << max(int(np.ceil(np.log2(max(n_oob, 1)))), 0)
    if n_oob > n_oob_pad:
        raise ValueError("n_oob_pad too small")
    oob_steps = np.full(n_oob_pad, S_pad, dtype=np.int32)  # sentinel slot
    oob_nodes = np.full(n_oob_pad, N, dtype=np.int32)      # sentinel slot
    oob_steps[:n_oob] = oob_flat
    oob_nodes[:n_oob] = node_pad[oob_flat]

    if n_seg is not None:
        if nseg_real > n_seg:
            raise ValueError("n_seg too small")
        a2 = np.zeros(n_seg, dtype=np.int32)
        a2[:nseg_real] = anchors
        anchors = a2

    return GridPlan(
        lidx=lidx, anchors=anchors, oob_steps=oob_steps,
        oob_nodes=oob_nodes, coverage=coverage, S=S, S_pad=S_pad,
    )


@dataclass
class GridConsensus:
    fn: object             # (xs, *arrays) -> (xs_new, x_node)
    fwd: object            # (xs, lidx, anchors, oob_s, oob_n) -> raw sums
    bwd: object            # (x_node, xs, lidx, anchors, oob_s, oob_n) -> xs_new
    arrays: tuple          # (lidx, anchors, oob_steps, oob_nodes, inv_cnt, has_steps)
    to_node_order: object  # (x_node, x_node_init [N], *arrays) -> x_node [N]
    coverage: float
    n_segments: int
    tile: int
    window: int
    stride: int
    n_pad: int
    node_offset: int  # front pad OFF: raw fwd sums live at [OFF, OFF+N)


def make_grid_fns(
    S: int, n_nodes: int, tile: int, seg_tiles: int, D: int, W: int,
    n_seg: int, rows: int = 1,
):
    """Build the (fwd, bwd) device functions for a grid geometry.  All
    per-graph data (lidx, anchors, oob tables) are runtime arguments,
    so the traced program depends only on the static geometry — shard
    builders call the same fns per device inside shard_map.

    ``xs`` may be [S] or [R, S]; rows share the one-hot work (the dots
    batch over R in their free dimension).
    """
    import jax
    import jax.numpy as jnp
    import jax.lax as lax

    N = int(n_nodes)
    T = int(tile)
    g = -(-S // T)

    m = W // D
    L = seg_tiles * D  # per-segment window span at stride D
    # The one-hot/dot stage runs over WHOLE segments (g padded to
    # n_seg*seg_tiles, pad tiles dead) so the window<->node stages can
    # consume fixed [seg_tiles]-tile blocks without a separate pad+
    # re-layout copy of the [R, g, W] window buffer (a real transpose
    # for R > 1; the dead-tile dot work is ~3% and free vs that copy).
    g_pad = n_seg * seg_tiles
    S_pad = g_pad * T
    # node buffer: [OFF | N nodes | W + seg_tiles*D slack]; anchors
    # arrive in buffer coordinates (plan_grid adds OFF) and are
    # D-grid-aligned (plan_grid floors them), so the buffer is viewed
    # as [n_rows, D] whole rows for the placement dots below
    OFF = seg_tiles * D
    n_pad = OFF + N + W + seg_tiles * D + D
    n_pad = -(-n_pad // D) * D  # whole D-rows
    n_rows = n_pad // D
    LC = L + (m - 1) * D        # combined per-segment run length
    rps = LC // D               # rows per segment (LC is a D multiple)
    # Dot precision: HIGHEST (full f32).  Measured (r3,
    # scratch/gc_tile_probe.py at T=256/S=4M): dropping to HIGH saves
    # only ~2% (the dots are not the consensus bottleneck — the
    # intermediates' HBM traffic and per-segment dynamic slices are)
    # and costs exactness (relerr 2.0e-5 vs 1.5e-7 against the f64
    # scatter-mean).  GFASORT_GC_PRECISION overrides for experiments.
    import os as _os

    HIGH = {
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
        "default": jax.lax.Precision.DEFAULT,
    }[_os.environ.get("GFASORT_GC_PRECISION", "highest")]

    # lo-factor width of the window-index split li = hi*LO + lo.  64,
    # NOT the 128 lane width: measured 7-10x faster for the window
    # reduction dot at IDENTICAL exactness (relerr 9.6e-8 vs the f64
    # reference for both; scratch/gc_dot_probe.py: L128 9.8 ms, L64
    # 1.38 ms, L32 1.45 ms at S=4M) — the [.., T, 128]-minor one-hot
    # operand apparently hits a pathological layout/pass structure in
    # the f32 HIGHEST dot that the 64-minor factor avoids, and M=Wh
    # doubles (32 -> 64) toward the MXU's 128 rows.
    # ...for MULTI-row inputs (nD layout, R=2D) the bwd expansion
    # tensor e [g_pad, R, W/LO, T] doubles with 1/LO and the traffic
    # loss beats the dot win (2D layout measured 645 -> 584 M/s at
    # LO=64), so wide-R builds keep 128.
    _lo_default = 64 if rows <= 2 else 128
    LO = int(_os.environ.get("GFASORT_GC_LANE", _lo_default))
    if LO not in (32, 64, 128):
        raise ValueError(
            f"GFASORT_GC_LANE={LO}: allowed values are 32, 64, 128"
        )
    if W % LO:
        raise ValueError(
            f"GFASORT_GC_LANE={LO} does not divide the consensus window "
            f"W={W}; use a smaller lane factor or leave it unset"
        )
    LO_SH = {128: 7, 64: 6, 32: 5}[LO]
    Whl = W // LO
    # window<->node merge strategy, also rows-aware (see the branch
    # comments in fwd/bwd): placement dots for narrow R, scans for
    # wide R.  GFASORT_GC_MERGE={auto,dot,scan} overrides.
    _merge = _os.environ.get("GFASORT_GC_MERGE", "auto")
    use_placement = {"auto": rows <= 2, "dot": True, "scan": False}[_merge]

    def _one_hots(lidx_a):
        # pad [g, T] -> [g_pad, T] with -1 (dead): pad tiles select
        # nothing in either one-hot factor
        lidx_p = jnp.full((g_pad, T), -1, jnp.int32).at[:g].set(lidx_a)
        hi_i = lidx_p >> LO_SH                   # [g_pad, T]; -1 dead/oob
        lo_i = lidx_p & (LO - 1)
        iota_hi = lax.broadcasted_iota(jnp.int32, (g_pad, Whl, T), 1)
        iota_lo = lax.broadcasted_iota(jnp.int32, (g_pad, T, LO), 2)
        sel_hi = hi_i[:, None, :] == iota_hi     # [g_pad, Whl, T] bool
        oh_lo = (
            (lo_i[:, :, None] == iota_lo) & (lidx_p[:, :, None] >= 0)
        ).astype(jnp.float32)                    # [g_pad, T, LO]
        return sel_hi, oh_lo

    def _placement(anchors_a):
        """One-hot row-placement matrix P [n_seg*rps, n_rows]:
        P[seg*rps + i, r] = 1 iff r == anchors[seg]/D + i.  Anchors are
        D-grid-aligned, so the window->node overlap-add (and its
        transpose, the node->window fetch) become ONE dense MXU dot
        over whole D-rows each — replacing the per-segment
        dynamic-slice scans whose ~7 us/dynamic-op cost dominated the
        consensus (~6.4 ms fwd + ~2 ms bwd of the 21 ms R=1 call at
        S=4M; scratch/gc_parts_probe.py).  The dot is
        [n_seg*rps, n_rows] x [n_rows, R*D] ~= 38 GFLOP at the bench
        geometry — well under 1 ms on the MXU, and the placement
        matrix is shared by fwd and bwd within one program."""
        a_row = (anchors_a // D).astype(jnp.int32)           # [n_seg]
        t = a_row[:, None] + lax.broadcasted_iota(
            jnp.int32, (n_seg, rps), 1
        )                                                    # [n_seg, rps]
        t_flat = t.reshape(n_seg * rps)
        iota_r = lax.broadcasted_iota(
            jnp.int32, (n_seg * rps, n_rows), 1
        )
        return (t_flat[:, None] == iota_r).astype(jnp.float32)

    def fwd(xs, lidx_a, anchors_a, oob_steps_a, oob_nodes_a):
        """xs [S] or [R, S] -> raw per-node sums [n_pad] or [R, n_pad]
        (UNNORMALIZED; shard engines psum before dividing)."""
        one_row = xs.ndim == 1
        xs2 = xs.reshape(1, S) if one_row else xs
        R = xs2.shape[0]
        xs_pad = jnp.zeros((R, S_pad + 1), jnp.float32).at[:, :S].set(
            xs2.astype(jnp.float32)
        )
        xs_t = xs_pad[:, :S_pad].reshape(R, g_pad, T)

        sel_hi, oh_lo = _one_hots(lidx_a)
        # a[r, j, hi, t] = sel_hi * xs; dot over t against oh_lo
        a = jnp.where(sel_hi[None], xs_t[:, :, None, :], 0.0)
        wsum = lax.dot_general(
            a, oh_lo,
            dimension_numbers=(((3,), (1,)), ((1,), (0,))),
            preferred_element_type=jnp.float32,
            precision=HIGH,
        )                                         # [g_pad, R, Whl, LO]
        # segment-major view: a bitcast of the dot output, no transpose
        w_sm = wsum.reshape(n_seg, seg_tiles, R, W)

        if use_placement:
            # Combine each segment's m strided chunks into ONE
            # contiguous [R, LC] run with STATIC-offset adds (fusible,
            # no dynamic ops), vectorized over all segments at once.
            comb = jnp.zeros((n_seg, R, LC), jnp.float32)
            for r in range(m):
                chunk = w_sm[:, :, :, r * D : (r + 1) * D].transpose(
                    0, 2, 1, 3
                ).reshape(n_seg, R, L)
                comb = comb.at[:, :, r * D : r * D + L].add(chunk)

            # window -> node: one dense one-hot placement dot over
            # whole D-rows (anchors are D-grid-aligned; see
            # _placement).  Replaced the r3 lax.scan whose per-segment
            # dynamic slice+update pairs cost ~7 us each (~6.4 ms at
            # 489 segments).  comb [n_seg, R, LC] -> rows
            # [n_seg*rps, R*D]: row i of seg s holds
            # comb[s, :, i*D:(i+1)*D] for every R
            rows = comb.reshape(n_seg, R, rps, D).transpose(
                0, 2, 1, 3
            ).reshape(n_seg * rps, R * D)
            P = _placement(anchors_a)
            ssum_rows = lax.dot_general(
                P, rows,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=HIGH,
            )                                    # [n_rows, R*D]
            ssum = ssum_rows.reshape(n_rows, R, D).transpose(
                1, 0, 2
            ).reshape(R, n_pad)
        else:
            # wide-R (nD layout): the placement dot's FLOPs scale with
            # R·D·n_rows and overtake the scan it replaces (2D layout
            # measured 645 -> 601 M/s); keep the r3 scan — 2 dynamic
            # ops per segment, R-independent.
            def fwd_seg(ssum, seg_in):
                off, w = seg_in  # off scalar; w [seg_tiles, R, W]
                comb = jnp.zeros((R, LC), jnp.float32)
                for r in range(m):
                    chunk = w[:, :, r * D : (r + 1) * D].transpose(
                        1, 0, 2
                    ).reshape(R, L)
                    comb = comb.at[:, r * D : r * D + L].add(chunk)
                o = off.astype(jnp.int32)
                seg = lax.dynamic_slice(ssum, (jnp.int32(0), o), (R, LC))
                ssum = lax.dynamic_update_slice(
                    ssum, seg + comb, (jnp.int32(0), o)
                )
                return ssum, None

            # initial carry derives from a varying input (0 * xs
            # broadcast) so its varying-manual-axes match the scanned
            # operands under shard_map (scan-vma rule)
            ssum = jnp.zeros((R, n_pad), jnp.float32) + 0.0 * xs_pad[:, :1]
            ssum, _ = lax.scan(fwd_seg, ssum, (anchors_a, w_sm))
        # exact element fallback for out-of-band steps (sentinel points
        # at a padded zero slot / node slot N)
        ssum = ssum.at[:, OFF + oob_nodes_a].add(xs_pad[:, oob_steps_a])
        return ssum[0] if one_row else ssum

    def bwd(x_node, xs, lidx_a, anchors_a, oob_steps_a, oob_nodes_a):
        """x_node [N]/[R, N] per-node means -> xs_new shaped like xs
        (dead lanes keep their xs value)."""
        one_row = xs.ndim == 1
        xs2 = xs.reshape(1, S) if one_row else xs
        xn2 = x_node.reshape(1, N) if one_row else x_node
        R = xs2.shape[0]
        x_ext = jnp.zeros((R, n_pad), jnp.float32).at[:, OFF : OFF + N].set(
            xn2.astype(jnp.float32)
        )

        sel_hi, oh_lo = _one_hots(lidx_a)

        # The 0 * xs2 vma-pin term pins the fetched windows'
        # varying-manual-axes to the per-shard axis under shard_map
        # (anchors are varying; x_ext may be a psum output, which is
        # invariant).
        vma_pin = 0.0 * xs2[:1, :1].astype(jnp.float32)
        if use_placement:
            # node -> window fetch: transpose of the fwd placement —
            # one dense dot pulls every segment's [R, LC] node run out
            # of the row-major node buffer (replaced the r3
            # per-segment dynamic_slice scan; ~7 us/op).
            P = _placement(anchors_a)
            x_rows = x_ext.reshape(R, n_rows, D).transpose(
                1, 0, 2
            ).reshape(n_rows, R * D)
            fetch = lax.dot_general(
                P, x_rows,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=HIGH,
            )                                    # [n_seg*rps, R*D]
            comb = fetch.reshape(n_seg, rps, R, D).transpose(
                0, 2, 1, 3
            ).reshape(n_seg, R, LC)
            parts = [
                comb[:, :, r * D : r * D + L].reshape(
                    n_seg, R, seg_tiles, D
                )
                for r in range(m)
            ]
            blk = jnp.concatenate(parts, axis=3)  # [n_seg, R, SL, W]
            xw_sm = blk.transpose(0, 2, 1, 3) + vma_pin.reshape(1, 1, 1, 1)
        else:
            # wide-R: r3 scan fetch (see fwd's rationale)
            def bwd_seg(_, off):
                ext = lax.dynamic_slice(
                    x_ext, (jnp.int32(0), off.astype(jnp.int32)), (R, LC)
                )
                parts = [
                    ext[:, r * D : r * D + L].reshape(R, seg_tiles, D)
                    for r in range(m)
                ]
                blk = jnp.concatenate(parts, axis=2)  # [R, SL, W]
                return None, blk.transpose(1, 0, 2) + vma_pin.reshape(
                    1, 1, 1
                )

            _, xw_sm = lax.scan(bwd_seg, None, anchors_a)

        e = lax.dot_general(
            xw_sm.reshape(g_pad, R, Whl, LO), oh_lo,
            dimension_numbers=(((3,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=HIGH,
        )                                         # [g_pad, R, Whl, T]
        xs_new = jnp.sum(
            jnp.where(sel_hi[:, None], e, 0.0), axis=2
        ).transpose(1, 0, 2).reshape(R, S_pad)
        # element fallback + dead-lane passthrough
        oob_vals = jnp.concatenate(
            [xn2.astype(jnp.float32), jnp.zeros((R, 1), jnp.float32)], axis=1
        )[:, jnp.minimum(oob_nodes_a, N)]
        xs_new = jnp.concatenate(
            [xs_new, jnp.zeros((R, 1), jnp.float32)], axis=1
        ).at[:, oob_steps_a].set(oob_vals)[:, :S]
        # every step in [:S] is live (padding never reaches [:S]) and is
        # either in-band (from the reduce) or in the oob table (just set)
        out = xs_new.astype(xs.dtype)
        return out[0] if one_row else out

    return fwd, bwd, n_pad


def build_grid_consensus(
    step_node: np.ndarray,      # [S] node index per step (>= 0)
    n_nodes: int,
    path_of_step: Optional[np.ndarray] = None,  # enables boundary-aware anchors
    tile: int = 256,
    seg_tiles: int = 32,
    max_window: int = 4096,
    dtype=np.float32,
    rows: int = 1,              # expected R (one-hot lane-split policy)
):
    """Build the grid consensus for a static step->node map.  Check
    ``coverage`` to decide whether to use it (see ops/sweep.py)."""
    import jax.numpy as jnp

    S = int(step_node.shape[0])
    N = int(n_nodes)
    T = int(tile)
    g = -(-S // T)
    n_seg = -(-g // seg_tiles)

    D, W, m = choose_grid_geometry(
        step_node, T, seg_tiles, max_window, path_of_step
    )
    plan = plan_grid(
        step_node, N, T, seg_tiles, D, W, path_of_step=path_of_step
    )

    cnt = np.bincount(step_node.astype(np.int64), minlength=N).astype(np.float64)
    inv_cnt_np = (1.0 / np.maximum(cnt, 1.0)).astype(dtype)

    fwd, bwd, n_pad = make_grid_fns(S, N, T, seg_tiles, D, W, n_seg,
                                    rows=rows)

    arrays = (
        jnp.asarray(plan.lidx),
        jnp.asarray(plan.anchors),
        jnp.asarray(plan.oob_steps),
        jnp.asarray(plan.oob_nodes),
        jnp.asarray(inv_cnt_np),
        jnp.asarray(cnt > 0),
    )

    OFF = seg_tiles * D

    def fn(xs, lidx_a, anchors_a, oob_s, oob_n, inv_cnt_a, *_rest):
        ssum = fwd(xs, lidx_a, anchors_a, oob_s, oob_n)
        x_node = (ssum[..., OFF : OFF + N] * inv_cnt_a).astype(xs.dtype)
        xs_new = bwd(x_node, xs, lidx_a, anchors_a, oob_s, oob_n)
        return xs_new, x_node

    def to_node_order(x_node, x_node_init, *arrays):
        """Nodes with no path steps keep their initial positions
        (reference: untouched x entries, src/sgd.rs:264-294)."""
        has = arrays[5]
        return jnp.where(has, x_node, x_node_init)

    return GridConsensus(
        fn=fn, fwd=fwd, bwd=bwd, arrays=arrays, to_node_order=to_node_order,
        coverage=plan.coverage, n_segments=n_seg, tile=T, window=W,
        stride=D, n_pad=n_pad, node_offset=OFF,
    )
