"""Fused unpack + int8 MXU matmul over PACKED bitmaps (Pallas).

The screen's intersection counts are an int8 matmul over 0/1
indicators stored packed (uint32, 32 bits/word). The XLA formulation
unpacks a (block, bits) int8 operand into HBM before the dot — a full
round trip of 32x-expanded operands per tile plus a lane-hostile
(.., W, 32)-minor relayout. This kernel unpacks INSIDE the matmul
pipeline: packed K-panels stream HBM->VMEM (32x less traffic), the
VPU expands them bit-major in VMEM, and the MXU consumes the expansion
immediately; nothing 32x-expanded ever touches HBM.

Bit order within a K-panel is bit-major (32 lane-aligned shifted
copies of the word block concatenated along K) — a PERMUTATION of the
word-major order the rest of the codebase uses, which is irrelevant
here because both operands use the same order and an intersection
count is invariant under any shared permutation of the bit axis.

Role in the reference: the all-vs-all sketch screen inside `skani
triangle` (src/skani.rs:144-159) whose TPU replacement is
ops/prefilter.py's MXU sweep; this kernel is that sweep's matmul
stage at higher MXU utilization.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _unpack_bitmajor(xw: jax.Array, dt=jnp.int8) -> jax.Array:
    """(R, KW) uint32 -> (R, 32*KW) 0/1 in dtype dt, bit-major: 32
    shifted lane-aligned copies concatenated along the K axis."""
    return jnp.concatenate(
        [
            ((xw >> jnp.uint32(s)) & jnp.uint32(1)).astype(dt)
            for s in range(32)
        ],
        axis=1,
    )


def _fused_kernel(a_ref, b_ref, o_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    au = _unpack_bitmajor(a_ref[:])
    bu = _unpack_bitmajor(b_ref[:])
    o_ref[:] += jax.lax.dot_general(
        au,
        bu,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


@partial(jax.jit, static_argnames=("tm", "tn", "kw", "interpret"))
def packed_intersect_matmul(
    a_packed: jax.Array,  # (M, W) uint32
    b_packed: jax.Array,  # (N, W) uint32
    *,
    tm: int = 512,
    tn: int = 512,
    kw: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Pairwise intersection counts (M, N) int32 between packed rows:
    out[i, j] = popcount(a[i] AND b[j]), computed as a fused
    unpack+matmul on the MXU. M/N must be multiples of tm/tn and W of
    kw (the screen's tiles are pow2-padded already)."""
    m, w = a_packed.shape
    n, wb = b_packed.shape
    if wb != w:
        raise ValueError(f"word width mismatch: {w} vs {wb}")
    if m % tm or n % tn or w % kw:
        raise ValueError(f"shape ({m},{n},{w}) not tiled by ({tm},{tn},{kw})")
    grid = (m // tm, n // tn, w // kw)
    # Under shard_map the output must carry the inputs' varying-over-
    # mesh-axes annotation (vma) or tracing rejects the pallas_call;
    # outside shard_map avals carry an empty vma (or none on older
    # jax), where this is a no-op.
    vma_a = getattr(getattr(a_packed, "aval", None), "vma", None)
    vma_b = getattr(getattr(b_packed, "aval", None), "vma", None)
    if vma_a is not None or vma_b is not None:
        out_shape = jax.ShapeDtypeStruct(
            (m, n), jnp.int32,
            vma=frozenset(vma_a or ()) | frozenset(vma_b or ()),
        )
    else:
        out_shape = jax.ShapeDtypeStruct((m, n), jnp.int32)
    return pl.pallas_call(
        _fused_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, kw), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, kw), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        interpret=interpret,
    )(a_packed, b_packed)
