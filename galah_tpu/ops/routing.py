"""Scatter-free data movement primitives for TPU.

XLA lowers scatter, gather-by-index and sort on TPU to serialized
loops at ~60-120M updates/s — two orders below VPU/HBM speed — which
made the device sketcher scatter/sort-bound (benchmarks/RESULTS.md
round-2 addendum 7). Every data movement the sketch pipeline needs is
in fact a MONOTONE routing or a small fixed sorting network, and both
have O(log) formulations built entirely from power-of-two shifts and
elementwise selects that run at memory bandwidth:

- monotone_compact: move masked elements to the front. Element i's
  left-distance d_i = i - rank_i (= unselected count before i) is
  nondecreasing, so processing distance bits LOW to HIGH moves each
  element by 2^b exactly when bit b of its remaining distance is set,
  and no two live elements ever collide (proof: a collision at step b
  needs remaining distances r_X <= r_Y with bit b set on X and clear
  on Y at positions 2^b apart, forcing original d_Y > d_X against
  monotonicity). log2(N) passes of shift+select.

- monotone_expand: the mirror image — move element j RIGHT to
  dests[j], requiring dests strictly increasing over live elements
  that sit COMPACTED at the front (then d_j = dests_j - j is
  nondecreasing). Used to build sorted-set bitmaps and fragment grids
  without scatter.

- bitonic_sort: Batcher's bitonic network over a power-of-two minor
  axis as log^2 reshape/flip/min/max stages. The XOR-partner exchange
  at distance j is a free reshape to (..., W/2j, 2, j) plus a
  middle-axis swap — no lane shuffles, no gathers. Multi-key
  (lexicographic) variants carry payload arrays through the same
  compare-exchanges.

These primitives let the device sketcher (ops/device_sketch.py) run
its compaction, per-fragment dedup and bitmap construction at
VPU/HBM speed; the reference delegates this entire stage to host CPUs
(skani sketching, reference src/skani.rs:270-290).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def _shift_left(x: jax.Array, sh: int, fill) -> jax.Array:
    """x[..., i] <- x[..., i+sh]; vacated tail filled with `fill`."""
    pad = jnp.full(x.shape[:-1] + (sh,), fill, dtype=x.dtype)
    return jnp.concatenate([x[..., sh:], pad], axis=-1)


def _shift_right(x: jax.Array, sh: int, fill) -> jax.Array:
    """x[..., i] <- x[..., i-sh]; vacated head filled with `fill`."""
    pad = jnp.full(x.shape[:-1] + (sh,), fill, dtype=x.dtype)
    return jnp.concatenate([pad, x[..., :-sh]], axis=-1)


def monotone_compact(
    mask: jax.Array,
    arrays: Sequence[jax.Array],
    pads: Sequence,
    cumsum_fn=None,
) -> Tuple[List[jax.Array], jax.Array]:
    """Move elements where mask is True to the front of the minor axis,
    preserving order; slots past the live count become `pads`.

    mask: (..., N) bool. arrays: same-shape integer arrays to route
    together. Returns (routed_arrays, n_live) with n_live of shape
    (...,). Cost: ceil(log2(N)) shift+select passes per array.

    cumsum_fn: optional minor-axis inclusive prefix sum for a 1D int32
    array (pass ops.pair_table._fast_cumsum on long TPU arrays — XLA's
    long-axis cumsum is ~30x slower than the hierarchical 2D scan).
    """
    n = mask.shape[-1]
    if cumsum_fn is not None:
        rank = cumsum_fn(mask.astype(jnp.int32))
    else:
        rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1)
    n_live = rank[..., -1]
    # exclusive rank = selected strictly before i
    excl = rank - mask.astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, mask.shape, mask.ndim - 1)
    d = jnp.where(mask, iota - excl, 0)
    vals = [
        jnp.where(mask, a, jnp.asarray(p, dtype=a.dtype))
        for a, p in zip(arrays, pads)
    ]
    nbits = max(1, (n - 1).bit_length())
    for b in range(nbits):
        sh = 1 << b
        if sh >= n:
            break
        d_arr = _shift_left(d, sh, 0)
        take = ((d_arr >> b) & 1) == 1
        vacate = ((d >> b) & 1) == 1
        vals = [
            jnp.where(
                take,
                _shift_left(v, sh, p),
                jnp.where(vacate, jnp.asarray(p, dtype=v.dtype), v),
            )
            for v, p in zip(vals, pads)
        ]
        d = jnp.where(take, d_arr - sh, jnp.where(vacate, 0, d))
    return vals, n_live


def monotone_expand(
    values: jax.Array,
    dests: jax.Array,
    n_live,
    out_size: int,
    pad,
) -> jax.Array:
    """Scatter-free expansion: out[dests[j]] = values[j] for j < n_live,
    `pad` elsewhere.

    REQUIRES: live entries compacted at the front of the minor axis
    (j < n_live) and dests strictly increasing over them, with
    dests[j] >= j (guaranteed when dests are sorted distinct
    non-negatives: the j-th smallest is >= j). values/dests: (..., M);
    out: (..., out_size). Cost: ceil(log2(out_size)) passes.
    """
    m = values.shape[-1]
    assert m <= out_size, (m, out_size)
    iota = jax.lax.broadcasted_iota(jnp.int32, values.shape, values.ndim - 1)
    live = iota < n_live[..., None]
    x = jnp.where(live, values, jnp.asarray(pad, dtype=values.dtype))
    d = jnp.where(live, dests - iota, 0)
    if m < out_size:
        zshape = values.shape[:-1] + (out_size - m,)
        x = jnp.concatenate(
            [x, jnp.full(zshape, pad, dtype=values.dtype)], axis=-1
        )
        d = jnp.concatenate([d, jnp.zeros(zshape, jnp.int32)], axis=-1)
    # Bits HIGH to LOW: the mirror of compaction's low-to-high order.
    # (For right-moves with nondecreasing distances, low-to-high CAN
    # collide — e.g. dests [1, 3] from positions [0, 1]: at b=0 the
    # first element lands on the still-waiting second. High-to-low is
    # provably collision-free: a collision at step b forces, via the
    # mod-2^{b+1} remainders, position order to contradict either
    # d-monotonicity or target order.)
    nbits = max(1, (out_size - 1).bit_length())
    for b in reversed(range(nbits)):
        sh = 1 << b
        if sh >= out_size:
            continue
        d_arr = _shift_right(d, sh, 0)
        take = ((d_arr >> b) & 1) == 1
        vacate = ((d >> b) & 1) == 1
        x = jnp.where(
            take,
            _shift_right(x, sh, pad),
            jnp.where(vacate, jnp.asarray(pad, dtype=x.dtype), x),
        )
        d = jnp.where(take, d_arr - sh, jnp.where(vacate, 0, d))
    return x


def _exchange(
    arrays: Sequence[jax.Array], kk: int, j: int, n_keys: int
) -> List[jax.Array]:
    """One bitonic compare-exchange stage: partner = i ^ j, ascending
    within blocks where (i & kk) == 0. Lexicographic on the first
    n_keys arrays; the rest ride along as payload."""
    w = arrays[0].shape[-1]
    lead = arrays[0].shape[:-1]
    halves = [a.reshape(*lead, w // (2 * j), 2, j) for a in arrays]
    a_lo = [h[..., 0, :] for h in halves]
    a_hi = [h[..., 1, :] for h in halves]
    # ascending iff bit log2(kk) of the element index is 0; that bit is
    # constant within a pair (it is >= log2(2j)) and depends only on
    # the block coordinate u: i = u*2j + v*j + w.
    u = jax.lax.broadcasted_iota(jnp.int32, (w // (2 * j), 1), 0)
    asc = (u * (2 * j) & kk) == 0
    gt = a_lo[0] > a_hi[0]
    if n_keys > 1:
        eq = a_lo[0] == a_hi[0]
        for k in range(1, n_keys):
            gt = gt | (eq & (a_lo[k] > a_hi[k]))
            if k + 1 < n_keys:
                eq = eq & (a_lo[k] == a_hi[k])
    swap = jnp.where(asc, gt, ~gt)
    out = []
    for lo, hi in zip(a_lo, a_hi):
        new_lo = jnp.where(swap, hi, lo)
        new_hi = jnp.where(swap, lo, hi)
        out.append(
            jnp.stack([new_lo, new_hi], axis=-2).reshape(*lead, w)
        )
    return out


def bitonic_sort(
    arrays: Sequence[jax.Array], n_keys: int = 1
) -> List[jax.Array]:
    """Sort along the minor axis (width must be a power of two) by the
    first n_keys arrays lexicographically, carrying the rest as
    payload. log2(W)*(log2(W)+1)/2 elementwise stages, no scatters."""
    arrays = list(arrays)
    w = arrays[0].shape[-1]
    assert w & (w - 1) == 0, f"bitonic width {w} not a power of two"
    kk = 2
    while kk <= w:
        j = kk // 2
        while j >= 1:
            arrays = _exchange(arrays, kk, j, n_keys)
            j //= 2
        kk *= 2
    return arrays
