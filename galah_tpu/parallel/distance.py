"""Mesh-sharded all-vs-all sketch screen.

The genome indicator matrix is sharded row-wise across the mesh; the
pairwise-intersection matmul is expressed once and XLA inserts the
collectives (all-gather of the contracted side over ICI). With a 2D
mesh the indicator width is additionally sharded over the "buckets"
axis and partial counts are psum-reduced across it — the tensor-
parallel analog.

The sparse above-threshold pair list is extracted host-side per row
shard and merged — the host-side greedy clustering then proceeds
identically regardless of device count, which is the distributed
invariant the tests pin (same clusters.tsv for any mesh size).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from galah_tpu.ops.prefilter import ScreenResult, _screen_dtype

logger = logging.getLogger(__name__)


def _cont_from_counts(counts, sizes_row, sizes_col, bits_f):
    a = sizes_row[:, None]
    b = sizes_col[None, :]
    c1 = jnp.maximum(counts - a * b / bits_f, 0.0)
    c = jnp.maximum(counts - (a - c1) * (b - c1) / bits_f, 0.0)
    denom = jnp.maximum(jnp.minimum(a, b), 1.0)
    return jnp.minimum(c / denom, 1.0)


def sharded_screen_triangle(
    indicators: np.ndarray,
    sizes: np.ndarray,
    k: int,
    min_containment: float,
    mesh: Optional[Mesh] = None,
) -> ScreenResult:
    """All-vs-all screen with the indicator matrix sharded over the
    mesh's "rows" axis (and "buckets" axis if 2D).

    indicators: (n, B) uint8 0/1; sizes: (n,) counts.
    """
    if mesh is None:
        from galah_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    n, bits = indicators.shape
    rows_devices = mesh.shape["rows"]
    has_buckets = "buckets" in mesh.shape

    pad_rows = rows_devices * 8
    n_pad = ((n + pad_rows - 1) // pad_rows) * pad_rows
    # Ship packed bits (32x less transfer); unpack on device.
    packed = np.packbits(
        indicators.astype(bool), axis=1, bitorder="little"
    ).view(np.uint32)
    w = packed.shape[1]
    x = np.zeros((n_pad, w), dtype=np.uint32)
    x[:n] = packed
    s = np.zeros((n_pad,), dtype=np.float32)
    s[:n] = sizes.astype(np.float32)

    if has_buckets:
        x_spec = P("rows", "buckets")
    else:
        x_spec = P("rows", None)

    x_sharded = jax.device_put(jnp.asarray(x), NamedSharding(mesh, x_spec))
    s_rep = jax.device_put(jnp.asarray(s), NamedSharding(mesh, P()))

    @partial(
        jax.jit,
        out_shardings=NamedSharding(mesh, P("rows", None)),
        static_argnames=("bits_f",),
    )
    def screen(xs_packed, sizes_all, bits_f):
        shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
        xs = ((xs_packed[:, :, None] >> shifts) & jnp.uint32(1)).astype(
            _screen_dtype()
        ).reshape(xs_packed.shape[0], -1)
        counts = jax.lax.dot_general(
            xs,
            xs,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return _cont_from_counts(counts, sizes_all, sizes_all, bits_f)

    result = screen(x_sharded, s_rep, bits_f=float(bits))
    if jax.process_count() > 1:
        # Multi-host: shards live on different processes; gather across
        # the DCN before host-side sparse extraction (the extraction
        # itself could be done per-shard and allgathered sparsely — an
        # optimization once pair densities warrant it).
        from jax.experimental import multihost_utils

        result = multihost_utils.process_allgather(result, tiled=True)
    cont = np.array(result)
    cont = cont[:n, :n]
    iu = np.triu_indices(n, k=1)
    mask = cont[iu] >= min_containment
    gi, gj = iu[0][mask], iu[1][mask]
    ani = (cont[gi, gj] ** (1.0 / k) * 100.0).astype(np.float32)
    pairs = np.stack([gi, gj], axis=1).astype(np.int64)
    return ScreenResult(pairs=pairs, ani_est=ani)
