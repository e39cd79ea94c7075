"""Pallas TPU kernel: packed-bitmap AND-popcount screen.

Alternative to the bf16 indicator matmul (ops/prefilter.py) with a
32x smaller sketch representation: each genome's prefilter sketch is a
packed uint32 bitmap ((B/32) words, e.g. 8KB at B=2^18), so a
300k-genome corpus stays HBM-resident (2.4GB vs 78GB bf16 indicators).
Intersection counts come from AND + population_count on the VPU.

Grid: (row_tiles, col_tiles); each cell computes an (TI, TJ) tile of
counts by looping over the word dimension in VMEM-sized chunks. The
containment correction / ANI epilogue is shared with the matmul path.

On CPU (tests) the kernel runs in interpreter mode.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import List, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from galah_tpu.ops.prefilter import ScreenResult, _containment

logger = logging.getLogger(__name__)

TILE_I = 8
TILE_J = 128
WORD_CHUNK = 512


def pack_indicator(buckets: np.ndarray, bits: int) -> np.ndarray:
    """Sorted distinct bucket indices -> (bits/32,) uint32 bitmap."""
    words = np.zeros(bits // 32, dtype=np.uint32)
    np.bitwise_or.at(
        words, buckets >> 5, np.uint32(1) << (buckets & 31).astype(np.uint32)
    )
    return words


def _popcount_kernel(xi_ref, xj_ref, out_ref, *, chunk: int):
    """xi: (TILE_I, W) uint32; xj: (TILE_J, W) uint32 ->
    out: (TILE_I, TILE_J) int32 intersection counts.

    2D-only vector ops (row broadcast against the column tile) so
    Mosaic lowers cleanly onto the 8x128 VPU."""
    w = xi_ref.shape[1]
    nchunks = w // chunk

    def row_body(i, carry):
        def chunk_body(c, acc):
            lo = pl.multiple_of(c * chunk, chunk)
            row = xi_ref[pl.ds(i, 1), pl.ds(lo, chunk)]  # (1, CHUNK)
            xj = xj_ref[:, pl.ds(lo, chunk)]  # (TILE_J, CHUNK)
            both = row & xj
            pc = jax.lax.population_count(both).astype(jnp.int32)
            return acc + jnp.sum(pc, axis=1)[None, :]  # (1, TILE_J)

        acc = jax.lax.fori_loop(
            0, nchunks, chunk_body, jnp.zeros((1, TILE_J), jnp.int32)
        )
        out_ref[pl.ds(i, 1), :] = acc
        return carry

    jax.lax.fori_loop(0, TILE_I, row_body, 0)


@partial(jax.jit, static_argnames=("interpret",))
def _popcount_tile_counts(x_rows: jax.Array, x_cols: jax.Array, interpret: bool):
    """x_rows: (NI, W), x_cols: (NJ, W) uint32 -> (NI, NJ) int32."""
    ni, w = x_rows.shape
    nj = x_cols.shape[0]
    grid = (ni // TILE_I, nj // TILE_J)
    chunk = min(WORD_CHUNK, w)
    assert w % chunk == 0, f"bitmap word width {w} not divisible by {chunk}"
    return pl.pallas_call(
        partial(_popcount_kernel, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((ni, nj), jnp.int32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (TILE_I, w), lambda i, j: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (TILE_J, w), lambda i, j: (j, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (TILE_I, TILE_J), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
    )(x_rows, x_cols)


def _pad_rows(x: np.ndarray, multiple: int) -> np.ndarray:
    n = x.shape[0]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return x
    return np.pad(x, ((0, target - n), (0, 0)))


def screen_triangle_popcount(
    packed: Sequence[np.ndarray],
    sizes: np.ndarray,
    k: int,
    min_containment: float,
    bits: int,
    block: int = 2048,
) -> ScreenResult:
    """Lower-triangle screen over packed uint32 bitmaps."""
    n = len(packed)
    if n == 0:
        return ScreenResult(np.empty((0, 2), np.int64), np.empty(0, np.float32))
    interpret = jax.default_backend() == "cpu"
    inv_k = 1.0 / k
    sizes_f = sizes.astype(np.float32)
    pairs: List[np.ndarray] = []
    anis: List[np.ndarray] = []

    nblocks = (n + block - 1) // block
    for bi in range(nblocks):
        ilo, ihi = bi * block, min((bi + 1) * block, n)
        xi = _pad_rows(np.stack([packed[t] for t in range(ilo, ihi)]), TILE_I)
        xi_dev = jnp.asarray(xi)
        for bj in range(bi, nblocks):
            jlo, jhi = bj * block, min((bj + 1) * block, n)
            xj = _pad_rows(np.stack([packed[t] for t in range(jlo, jhi)]), TILE_J)
            counts = _popcount_tile_counts(xi_dev, jnp.asarray(xj), interpret)
            counts = counts[: ihi - ilo, : jhi - jlo].astype(jnp.float32)
            cont = np.array(
                _containment(
                    counts,
                    jnp.asarray(sizes_f[ilo:ihi]),
                    jnp.asarray(sizes_f[jlo:jhi]),
                    float(bits),
                )
            )
            if bi == bj:
                cont[np.tril_indices(cont.shape[0])] = -1.0  # -1: a cutoff of 0 must still drop self/reversed pairs
            hit = np.argwhere(cont >= min_containment)
            if hit.size:
                pairs.append(
                    np.stack([hit[:, 0] + ilo, hit[:, 1] + jlo], axis=1)
                )
                anis.append(
                    (cont[hit[:, 0], hit[:, 1]] ** inv_k * 100.0).astype(np.float32)
                )

    if pairs:
        return ScreenResult(np.concatenate(pairs), np.concatenate(anis))
    return ScreenResult(np.empty((0, 2), np.int64), np.empty(0, np.float32))
