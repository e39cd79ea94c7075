"""Mesh-sharded all-vs-all sketch screen (tiled, sparse-extracting).

The packed bitmap matrix is made resident on every device (replicated;
at the 300k-genome north star with shrunk bitmaps this is ~1-5GB, well
inside a v5e's 16GB HBM) and the upper-triangle TILE list is sharded
across the mesh: each device sweeps its own (block x block) tiles with
the MXU intersection matmul and extracts the sparse above-cutoff pairs
ON DEVICE. Only (count, idx, idx, val) tuples bounded by `cap` per tile
ever leave a device, so host memory is O(candidates), never O(n^2) —
the property that lets the screen reach the reference's "arbitrarily
many genomes" configs (skani's sketch-then-stream search,
reference src/skani.rs:229-377) at TPU speed.

Dispatches are chunked (fixed tile count per dispatch -> one compiled
shape) and drained through a bounded in-flight window. Multi-host runs
allgather only the sparse chunk results over DCN.

The host-side greedy clustering then proceeds identically regardless of
device count, which is the distributed invariant the tests pin (same
clusters.tsv for any mesh size).
"""

from __future__ import annotations

import logging
import math
from collections import deque
from functools import partial
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from galah_tpu.ops.prefilter import (
    ScreenResult,
    _block_containment_packed,
    _containment,
    _device_resident_budget,
    _extract_above_cutoff,
    _resident_screen_extract,
    _screen_block_for,
    _screen_cap_for,
    _screen_dt,
    _screen_dtype_name,
    _screen_matmul,
    _unpack_bits,
)

logger = logging.getLogger(__name__)

# Tiles per device per dispatch: large enough that dispatch overhead
# amortizes, small enough that a chunk's sparse output stays tiny.
TILES_PER_DEVICE = 8
# In-flight dispatch window (results drain once this many are issued).
DISPATCH_WINDOW = 8
# Row-sharded sweep: per-device per-stage compacted output capacity.
ROWSHARD_STAGE_CAP = 1 << 15


_TILE_FN_CACHE: dict = {}


def _tile_screen_fn(mesh: Mesh, block: int, cap: int, dtname: str):
    """Build (and cache) the jitted sharded tile sweep for one mesh,
    tile edge, and extraction cap. The bitmap width, containment cutoff
    and tile count are traced, so one compilation serves every run.

    Formulation: shard_map over every mesh axis — each device owns an
    equal slice of the (T, 3) [(bi, bj, valid)] tile list and scans it
    sequentially, slicing tiles out of the replicated packed matrix.
    (A vmap+GSPMD formulation of the same sweep compiled ~300x slower
    and batched the dynamic slices into gathers; the scan body compiles
    once and executes per-tile.)
    """
    key = (mesh, block, cap, dtname)
    fn = _TILE_FN_CACHE.get(key)
    if fn is not None:
        return fn

    axes = tuple(mesh.axis_names)

    def tile_body(x_all, sizes, bits_f, min_cont, tij):
        bi, bj, valid = tij[0], tij[1], tij[2]
        w = x_all.shape[1]
        si = jax.lax.dynamic_slice(x_all, (bi * block, 0), (block, w))
        sj = jax.lax.dynamic_slice(x_all, (bj * block, 0), (block, w))
        a = jax.lax.dynamic_slice(sizes, (bi * block,), (block,))
        b = jax.lax.dynamic_slice(sizes, (bj * block,), (block,))
        dt = _screen_dt(dtname)
        counts = _screen_matmul(_unpack_bits(si, dt), _unpack_bits(sj, dt))
        cont = _containment(counts, a, b, bits_f)
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
        cols_j = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
        mask = (cont >= min_cont) & ((bi != bj) | (cols_j > rows_i))
        mask = mask & (valid > 0)
        cnt, ii, jj, vals = _extract_above_cutoff(cont, mask, cap)
        return (
            cnt.astype(jnp.int32),
            ii,
            jj,
            vals.astype(jnp.bfloat16),
        )

    def local_fn(x_all, sizes, bits_f, min_cont, tiles):
        def scan_body(carry, tij):
            return carry, tile_body(x_all, sizes, bits_f, min_cont, tij)

        _, outs = jax.lax.scan(scan_body, 0, tiles)
        return outs

    fn = jax.jit(
        jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(axes, None)),
            out_specs=(P(axes), P(axes, None), P(axes, None), P(axes, None)),
        )
    )
    _TILE_FN_CACHE[key] = fn
    return fn


def _pick_block(n: int, block: int) -> int:
    """Shrink the tile edge for small inputs so tiny runs don't pay a
    (1024 x 1024) matmul for 24 genomes."""
    if n >= block:
        return block
    return max(128, 1 << (max(n - 1, 1)).bit_length())


def sharded_screen_triangle_packed(
    packed: Sequence[np.ndarray],
    sizes: np.ndarray,
    k: int,
    min_containment: float,
    bits: int,
    mesh: Optional[Mesh] = None,
    block: int = 0,
    cap: int = 0,
) -> ScreenResult:
    """Upper-triangle all-vs-all screen over packed uint32 bitmaps with
    the tile list sharded across `mesh`. block/cap of 0 pick the
    measured-best tile edge for the backend (_screen_block_for).

    packed: list-like of per-genome (W,) uint32 rows (may be lazy —
    rows materialize once while building the resident matrix).
    sizes: (n,) bucket counts.
    """
    if mesh is None:
        from galah_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    n = len(packed)
    if n == 0:
        return ScreenResult(np.empty((0, 2), np.int64), np.empty(0, np.float32))
    w = len(packed[0])
    block = _pick_block(n, block or _screen_block_for(n))
    cap = cap or _screen_cap_for(block)

    # Replicating the resident matrix is fastest while it fits; past
    # the per-device HBM budget, row-shard it so capacity scales with
    # device count (GALAH_TPU_ROWSHARD=1/0 forces either way).
    import os as _os

    rowshard_env = _os.environ.get("GALAH_TPU_ROWSHARD")
    n_pad_est = ((n + block - 1) // block) * block
    if rowshard_env != "0" and (
        rowshard_env == "1"
        or n_pad_est * w * 4 > _device_resident_budget()
    ):
        logger.info(
            "Row-sharding the resident packed matrix (%d rows x %d words "
            "> per-device budget)", n, w,
        )
        return sharded_screen_triangle_rowsharded(
            packed, sizes, k, min_containment, bits, mesh=mesh,
            # the row-sharded sweep broadcasts one column block per
            # stage over the mesh — keep its tiles at 1024 so the psum
            # payload and per-slot stage buffers stay modest
            block=min(block, 1024),
        )

    inv_k = 1.0 / k
    min_cont_static = float(np.float32(min_containment))
    n_devices = math.prod(mesh.shape.values())

    n_pad = ((n + block - 1) // block) * block
    nblocks = n_pad // block
    ntiles = nblocks * (nblocks + 1) // 2
    # Equal tile share per device per dispatch; tiny runs use one tile
    # per device so padding lanes don't multiply the work.
    tiles_per_device = min(
        TILES_PER_DEVICE, (ntiles + n_devices - 1) // n_devices
    )
    chunk_tiles = n_devices * tiles_per_device

    x_np = np.zeros((n_pad, w), dtype=np.uint32)
    for t in range(n):
        x_np[t] = packed[t]
    s_np = np.zeros((n_pad,), dtype=np.float32)
    s_np[:n] = sizes.astype(np.float32)

    rep = NamedSharding(mesh, P())
    axes = tuple(mesh.axis_names)
    mat_sh = NamedSharding(mesh, P(axes, None))
    x_all = jax.device_put(x_np, rep)
    s_all = jax.device_put(s_np, rep)
    del x_np

    dtn = _screen_dtype_name()
    fn = _tile_screen_fn(mesh, block, cap, dtn)
    bits_dev = jnp.float32(bits)
    min_cont_dev = jnp.float32(min_cont_static)

    tiles = [(bi, bj) for bi in range(nblocks) for bj in range(bi, nblocks)]
    multiproc = jax.process_count() > 1

    pairs: List[np.ndarray] = []
    anis: List[np.ndarray] = []

    def collect(tile_chunk, outs):
        if multiproc:
            from jax.experimental import multihost_utils

            cnt, ii, jj, vals = (
                multihost_utils.process_allgather(o, tiled=True) for o in outs
            )
        else:
            cnt, ii, jj, vals = outs
        cnt = np.asarray(cnt)
        ii = np.asarray(ii)
        jj = np.asarray(jj)
        vals = np.asarray(vals).astype(np.float32)
        for t, (bi, bj) in enumerate(tile_chunk):
            c = int(cnt[t])
            ii_t, jj_t, vals_t = ii[t], jj[t], vals[t]
            if c < 0:
                # Row-overflow signal (two-level extraction): re-run
                # this tile with the direct extraction — the matrix is
                # resident, so only sparse results move. Every process
                # executes the identical re-dispatch (lockstep
                # contract, as for the dense pull below).
                true_cnt = -c - 1
                if true_cnt <= cap:
                    c2, ii2, jj2, v2 = _resident_screen_extract(
                        x_all, s_all, jnp.int32(bi), jnp.int32(bj),
                        block=block, bits_f=float(bits),
                        min_cont=min_cont_static, cap=cap,
                        is_diag=bi == bj, dtname=dtn, direct=True,
                    )
                    c = int(c2)
                    ii_t = np.asarray(ii2)
                    jj_t = np.asarray(jj2)
                    vals_t = np.asarray(v2).astype(np.float32)
                else:
                    c = cap + 1
            if c > cap:
                # Rare overflow: pull this tile densely (block^2 floats).
                lo_i, lo_j = bi * block, bj * block
                cont = np.array(
                    _block_containment_packed(
                        x_all[lo_i : lo_i + block],
                        x_all[lo_j : lo_j + block],
                        s_all[lo_i : lo_i + block],
                        s_all[lo_j : lo_j + block],
                        float(bits),
                        dtname=dtn,
                    )
                ).astype(np.float32)
                if bi == bj:
                    cont[np.tril_indices(cont.shape[0])] = -1.0  # -1: a cutoff of 0 must still drop self/reversed pairs
                # Same f32-rounded cutoff as the on-device sparse path, so the
                # surviving pair set does not depend on whether a tile overflowed.
                hit = np.argwhere(cont >= min_cont_static)
                gi = hit[:, 0] + lo_i
                gj = hit[:, 1] + lo_j
                v = cont[hit[:, 0], hit[:, 1]]
            else:
                gi = ii_t[:c] + bi * block
                gj = jj_t[:c] + bj * block
                v = vals_t[:c]
            keep = (gi < n) & (gj < n)
            gi, gj, v = gi[keep], gj[keep], v[keep]
            if len(gi):
                pairs.append(np.stack([gi, gj], axis=1).astype(np.int64))
                anis.append((v ** inv_k * 100.0).astype(np.float32))

    pending: deque = deque()
    tij = np.zeros((chunk_tiles, 3), dtype=np.int32)
    for lo in range(0, len(tiles), chunk_tiles):
        tile_chunk = tiles[lo : lo + chunk_tiles]
        tij[:] = 0
        for t, (bi, bj) in enumerate(tile_chunk):
            tij[t] = (bi, bj, 1)
        outs = fn(
            x_all, s_all, bits_dev, min_cont_dev,
            jax.device_put(tij.copy(), mat_sh),
        )
        pending.append((tile_chunk, outs))
        if len(pending) > DISPATCH_WINDOW:
            collect(*pending.popleft())
    while pending:
        collect(*pending.popleft())

    if pairs:
        return ScreenResult(np.concatenate(pairs), np.concatenate(anis))
    return ScreenResult(np.empty((0, 2), np.int64), np.empty(0, np.float32))


def sharded_screen_rectangle_packed(
    query_packed: Sequence[np.ndarray],
    query_sizes: np.ndarray,
    ref_packed: Sequence[np.ndarray],
    ref_sizes: np.ndarray,
    k: int,
    min_containment: float,
    bits: int,
    mesh: Optional[Mesh] = None,
    block: int = 0,
    cap: int = 0,
) -> ScreenResult:
    """Reference-genome (rectangular) screen with the
    query-block x ref-block tile list sharded across `mesh` — the
    mesh-scaled equivalent of the reference's stream-queries-against-
    ref-DB search (src/skani.rs:502-687; SURVEY P9).

    Queries and refs concatenate into one replicated resident matrix
    (queries at rows [0, nq_pad), refs at [nq_pad, ...)), and the tile
    sweep reuses the triangle's shard_map kernel: ref tiles carry block
    index nq_pad/block + bj, which never equals a query block index, so
    the kernel's diagonal mask reduces to the plain cutoff. Only sparse
    (count, ii, jj, val) tuples leave a device. Returned pairs are
    (query_idx, ref_idx)."""
    if mesh is None:
        from galah_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    nq, nr = len(query_packed), len(ref_packed)
    if nq == 0 or nr == 0:
        return ScreenResult(np.empty((0, 2), np.int64), np.empty(0, np.float32))
    w = len(query_packed[0])
    block = _pick_block(max(nq, nr), block or _screen_block_for(max(nq, nr)))
    cap = cap or _screen_cap_for(block)
    inv_k = 1.0 / k
    min_cont_static = float(np.float32(min_containment))
    n_devices = math.prod(mesh.shape.values())

    nq_pad = ((nq + block - 1) // block) * block
    nr_pad = ((nr + block - 1) // block) * block
    nqb, nrb = nq_pad // block, nr_pad // block
    ntiles = nqb * nrb
    tiles_per_device = min(
        TILES_PER_DEVICE, (ntiles + n_devices - 1) // n_devices
    )
    chunk_tiles = n_devices * tiles_per_device

    x_np = np.zeros((nq_pad + nr_pad, w), dtype=np.uint32)
    for t in range(nq):
        x_np[t] = query_packed[t]
    for t in range(nr):
        x_np[nq_pad + t] = ref_packed[t]
    s_np = np.zeros((nq_pad + nr_pad,), dtype=np.float32)
    s_np[:nq] = query_sizes.astype(np.float32)
    s_np[nq_pad : nq_pad + nr] = ref_sizes.astype(np.float32)

    rep = NamedSharding(mesh, P())
    axes = tuple(mesh.axis_names)
    mat_sh = NamedSharding(mesh, P(axes, None))
    x_all = jax.device_put(x_np, rep)
    s_all = jax.device_put(s_np, rep)
    del x_np

    dtn = _screen_dtype_name()
    fn = _tile_screen_fn(mesh, block, cap, dtn)
    bits_dev = jnp.float32(bits)
    min_cont_dev = jnp.float32(min_cont_static)

    # Tiles address the concatenated matrix: (query block bi, global
    # ref block nqb + bj).
    tiles = [(bi, nqb + bj) for bi in range(nqb) for bj in range(nrb)]
    multiproc = jax.process_count() > 1

    pairs: List[np.ndarray] = []
    anis: List[np.ndarray] = []

    def collect(tile_chunk, outs):
        if multiproc:
            from jax.experimental import multihost_utils

            cnt, ii, jj, vals = (
                multihost_utils.process_allgather(o, tiled=True) for o in outs
            )
        else:
            cnt, ii, jj, vals = outs
        cnt = np.asarray(cnt)
        ii = np.asarray(ii)
        jj = np.asarray(jj)
        vals = np.asarray(vals).astype(np.float32)
        for t, (bi, bjg) in enumerate(tile_chunk):
            c = int(cnt[t])
            ii_t, jj_t, vals_t = ii[t], jj[t], vals[t]
            if c < 0:
                # Row-overflow signal: re-extract on device (identical
                # lockstep re-dispatch on every process).
                true_cnt = -c - 1
                if true_cnt <= cap:
                    c2, ii2, jj2, v2 = _resident_screen_extract(
                        x_all, s_all, jnp.int32(bi), jnp.int32(bjg),
                        block=block, bits_f=float(bits),
                        min_cont=min_cont_static, cap=cap,
                        is_diag=False, dtname=dtn, direct=True,
                    )
                    c = int(c2)
                    ii_t = np.asarray(ii2)
                    jj_t = np.asarray(jj2)
                    vals_t = np.asarray(v2).astype(np.float32)
                else:
                    c = cap + 1
            if c > cap:
                # Rare overflow: dense pull of this one tile.
                lo_i, lo_j = bi * block, bjg * block
                cont = np.array(
                    _block_containment_packed(
                        x_all[lo_i : lo_i + block],
                        x_all[lo_j : lo_j + block],
                        s_all[lo_i : lo_i + block],
                        s_all[lo_j : lo_j + block],
                        float(bits),
                        dtname=dtn,
                    )
                ).astype(np.float32)
                hit = np.argwhere(cont >= min_cont_static)
                gi = hit[:, 0] + lo_i
                gj = hit[:, 1] + (bjg - nqb) * block
                v = cont[hit[:, 0], hit[:, 1]]
            else:
                gi = ii_t[:c] + bi * block
                gj = jj_t[:c] + (bjg - nqb) * block
                v = vals_t[:c]
            keep = (gi < nq) & (gj < nr)
            gi, gj, v = gi[keep], gj[keep], v[keep]
            if len(gi):
                pairs.append(np.stack([gi, gj], axis=1).astype(np.int64))
                anis.append((v ** inv_k * 100.0).astype(np.float32))

    pending: deque = deque()
    tij = np.zeros((chunk_tiles, 3), dtype=np.int32)
    for lo in range(0, len(tiles), chunk_tiles):
        tile_chunk = tiles[lo : lo + chunk_tiles]
        tij[:] = 0
        for t, (bi, bjg) in enumerate(tile_chunk):
            tij[t] = (bi, bjg, 1)
        outs = fn(
            x_all, s_all, bits_dev, min_cont_dev,
            jax.device_put(tij.copy(), mat_sh),
        )
        pending.append((tile_chunk, outs))
        if len(pending) > DISPATCH_WINDOW:
            collect(*pending.popleft())
    while pending:
        collect(*pending.popleft())

    if pairs:
        return ScreenResult(np.concatenate(pairs), np.concatenate(anis))
    return ScreenResult(np.empty((0, 2), np.int64), np.empty(0, np.float32))


def _rowshard_stage_fn(mesh: Mesh, block: int, cap: int, slots: int,
                       stage_cap: int, dtname: str):
    """Build (and cache) the jitted one-column-stage sweep for the
    ROW-SHARDED resident matrix.

    Layout: global row blocks are distributed cyclically — block g is
    owned by device g % n_dev at local slot g // n_dev — so per-stage
    triangle work (all blocks g <= cb against column block cb) is
    balanced within one tile across devices. Each stage:

      1. the owner of column block cb contributes its slice, psum
         broadcasts it to every device (ICI),
      2. every device scans its local slots, computing only valid
         triangle tiles (lax.cond skips g > cb), extracting sparse
         above-cutoff hits on device,
      3. hits are compacted into one fixed-size per-device stream with
         a running-offset dynamic_update_slice; only (cnts, stream)
         leave the device.

    Per-device residency is O(n*W / n_dev) — the property that lets the
    screen reach the 300k-genome multi-host north star (the role skani's
    sketch-then-stream search plays at scale, reference
    src/skani.rs:229-377). Column stage index cb and the real block
    count are traced, so one compilation serves every stage and run.
    """
    key = ("rowshard", mesh, block, cap, slots, stage_cap, dtname)
    fn = _TILE_FN_CACHE.get(key)
    if fn is not None:
        return fn

    axes = tuple(mesh.axis_names)
    n_dev = math.prod(mesh.shape.values())

    def local_fn(x_local, s_local, bits_f, min_cont, cb, nblocks_real):
        w = x_local.shape[1]
        idx = jnp.int32(0)
        for ax in axes:
            idx = idx * mesh.shape[ax] + jax.lax.axis_index(ax)
        owner = cb % n_dev
        cslot = cb // n_dev
        blk = jax.lax.dynamic_slice(x_local, (cslot * block, 0), (block, w))
        sblk = jax.lax.dynamic_slice(s_local, (cslot * block,), (block,))
        col_x = jax.lax.psum(
            jnp.where(idx == owner, blk, jnp.zeros_like(blk)), axes
        )
        col_s = jax.lax.psum(jnp.where(idx == owner, sblk, 0.0), axes)
        dt = _screen_dt(dtname)
        col_unpacked = _unpack_bits(col_x, dt)
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
        cols_j = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)

        def compute(s):
            si = jax.lax.dynamic_slice(x_local, (s * block, 0), (block, w))
            a = jax.lax.dynamic_slice(s_local, (s * block,), (block,))
            g = idx + s * n_dev
            counts = _screen_matmul(_unpack_bits(si, dt), col_unpacked)
            cont = _containment(counts, a, col_s, bits_f)
            mask = (cont >= min_cont) & ((g != cb) | (cols_j > rows_i))
            # Direct nonzero here (not the two-level extraction): the
            # host-side stream replay must agree with the kernel's
            # stored counts, which the row-overflow sentinel would
            # complicate; this path's per-stage cost is dominated by
            # the column psum broadcast anyway.
            cnt = jnp.sum(mask).astype(jnp.int32)
            ii, jj = jnp.nonzero(mask, size=cap, fill_value=0)
            return (
                cnt,
                ii.astype(jnp.int32),
                jj.astype(jnp.int32),
                cont[ii, jj].astype(jnp.bfloat16),
            )

        def _vary(tree):
            # shard_map requires cond branches / scan carries to agree
            # on varying-over-mesh-axes types; constants start unvarying.
            return jax.tree.map(
                lambda v: jax.lax.pcast(v, axes, to="varying"), tree
            )

        def skip(s):
            return _vary(
                (
                    jnp.int32(0),
                    jnp.zeros((cap,), jnp.int32),
                    jnp.zeros((cap,), jnp.int32),
                    jnp.zeros((cap,), jnp.bfloat16),
                )
            )

        def scan_body(carry, s):
            off, out_ii, out_jj, out_vals = carry
            g = idx + s * n_dev
            valid = (g <= cb) & (g < nblocks_real)
            cnt, ii, jj, vals = jax.lax.cond(valid, compute, skip, s)
            woff = jnp.minimum(off, stage_cap - cap)

            # Write ONLY when this slot stored hits: an empty/skipped
            # slot's cap-sized zero buffer would otherwise land at the
            # clamped woff and silently clobber the tail of earlier
            # segments once off > stage_cap - cap — a clobber the host
            # replay (which flags only stored>0 clamped writes) cannot
            # detect.
            def write(bufs):
                o_ii, o_jj, o_v = bufs
                return (
                    jax.lax.dynamic_update_slice(o_ii, ii, (woff,)),
                    jax.lax.dynamic_update_slice(o_jj, jj, (woff,)),
                    jax.lax.dynamic_update_slice(o_v, vals, (woff,)),
                )

            out_ii, out_jj, out_vals = jax.lax.cond(
                cnt > 0, write, lambda bufs: bufs, (out_ii, out_jj, out_vals)
            )
            return (off + jnp.minimum(cnt, cap), out_ii, out_jj, out_vals), cnt

        init = _vary(
            (
                jnp.int32(0),
                jnp.zeros((stage_cap,), jnp.int32),
                jnp.zeros((stage_cap,), jnp.int32),
                jnp.zeros((stage_cap,), jnp.bfloat16),
            )
        )
        (_, out_ii, out_jj, out_vals), cnts = jax.lax.scan(
            scan_body, init, jnp.arange(slots, dtype=jnp.int32)
        )
        return cnts, out_ii, out_jj, out_vals

    fn = jax.jit(
        jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(axes, None), P(axes), P(), P(), P(), P()),
            out_specs=(P(axes), P(axes), P(axes), P(axes)),
        )
    )
    _TILE_FN_CACHE[key] = fn
    return fn


def _host_block(packed, n: int, w: int, g: int, block: int) -> np.ndarray:
    """Materialize row block g (original genome order) from host rows,
    zero-padded past n."""
    out = np.zeros((block, w), np.uint32)
    lo = g * block
    for j in range(max(0, min(n - lo, block))):
        out[j] = packed[lo + j]
    return out


def _dense_tile_hits(
    packed, sizes_pad, n, w, bits, g, cb, block, min_containment, dtname
):
    """Recompute one overflowing tile densely (device matmul on two
    host-assembled blocks) and return its above-cutoff hits."""
    xi = jnp.asarray(_host_block(packed, n, w, g, block))
    xj = jnp.asarray(_host_block(packed, n, w, cb, block))
    a = jnp.asarray(sizes_pad[g * block : (g + 1) * block])
    b = jnp.asarray(sizes_pad[cb * block : (cb + 1) * block])
    cont = np.array(
        _block_containment_packed(xi, xj, a, b, float(bits), dtname=dtname)
    ).astype(np.float32)
    if g == cb:
        cont[np.tril_indices(cont.shape[0])] = -1.0  # -1: a cutoff of 0 must still drop self/reversed pairs
    hit = np.argwhere(cont >= min_containment)
    gi = hit[:, 0] + g * block
    gj = hit[:, 1] + cb * block
    return gi, gj, cont[hit[:, 0], hit[:, 1]]


def sharded_screen_triangle_rowsharded(
    packed: Sequence[np.ndarray],
    sizes: np.ndarray,
    k: int,
    min_containment: float,
    bits: int,
    mesh: Optional[Mesh] = None,
    block: int = 1024,
    cap: int = 8192,
    stage_cap: int = ROWSHARD_STAGE_CAP,
) -> ScreenResult:
    """Upper-triangle all-vs-all screen with the packed matrix ROW-
    SHARDED across the mesh (cyclic block ownership): per-device HBM is
    O(n*W / n_dev), so capacity grows with devices/hosts instead of
    being capped by one device's memory as in the replicated sweep."""
    if mesh is None:
        from galah_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    n = len(packed)
    if n == 0:
        return ScreenResult(np.empty((0, 2), np.int64), np.empty(0, np.float32))
    w = len(packed[0])
    block = _pick_block(n, block)
    stage_cap = max(stage_cap, 2 * cap)
    inv_k = 1.0 / k
    min_cont_static = float(np.float32(min_containment))
    axes = tuple(mesh.axis_names)
    n_dev = math.prod(mesh.shape.values())

    nblocks_real = (n + block - 1) // block
    slots = (nblocks_real + n_dev - 1) // n_dev
    n_local = slots * block
    total = n_dev * n_local

    sizes_pad = np.zeros((nblocks_real * block,), np.float32)
    sizes_pad[:n] = np.asarray(sizes, np.float32)

    x_sh = NamedSharding(mesh, P(axes, None))
    s_sh = NamedSharding(mesh, P(axes))

    def _fill_rows(start: int, stop: int, width: Optional[int]) -> np.ndarray:
        """Rows [start, stop) of the block-permuted global matrix:
        permuted block p = d*slots + s holds original block
        g = d + s*n_dev (cyclic ownership)."""
        shape = (stop - start, w) if width else (stop - start,)
        out = np.zeros(shape, np.uint32 if width else np.float32)
        p0 = start // block
        for p in range(p0, (stop + block - 1) // block):
            d, s = divmod(p, slots)
            g = d + s * n_dev
            lo = max(start, p * block) - start
            if g >= nblocks_real:
                continue
            if width:
                out[lo : lo + block] = _host_block(packed, n, w, g, block)
            else:
                out[lo : lo + block] = sizes_pad[g * block : (g + 1) * block]
        return out

    def cb_x(index):
        sl = index[0]
        start = sl.start or 0
        stop = sl.stop if sl.stop is not None else total
        assert start % block == 0 and stop % block == 0, (start, stop)
        return _fill_rows(start, stop, w)

    def cb_s(index):
        sl = index[0]
        start = sl.start or 0
        stop = sl.stop if sl.stop is not None else total
        assert start % block == 0 and stop % block == 0, (start, stop)
        return _fill_rows(start, stop, None)

    x_all = jax.make_array_from_callback((total, w), x_sh, cb_x)
    s_all = jax.make_array_from_callback((total,), s_sh, cb_s)

    dtn = _screen_dtype_name()
    fn = _rowshard_stage_fn(mesh, block, cap, slots, stage_cap, dtn)
    bits_dev = jnp.float32(bits)
    min_cont_dev = jnp.float32(min_cont_static)
    nblocks_dev = jnp.int32(nblocks_real)
    multiproc = jax.process_count() > 1

    pairs: List[np.ndarray] = []
    anis: List[np.ndarray] = []

    def emit(gi, gj, v):
        keep = (gi < n) & (gj < n)
        gi, gj, v = gi[keep], gj[keep], v[keep]
        if len(gi):
            pairs.append(np.stack([gi, gj], axis=1).astype(np.int64))
            anis.append(
                (np.asarray(v, np.float32) ** inv_k * 100.0).astype(np.float32)
            )

    def collect(cb, outs):
        if multiproc:
            from jax.experimental import multihost_utils

            cnts, ii, jj, vals = (
                multihost_utils.process_allgather(o, tiled=True) for o in outs
            )
        else:
            cnts, ii, jj, vals = outs
        cnts = np.asarray(cnts)
        ii = np.asarray(ii)
        jj = np.asarray(jj)
        vals = np.asarray(vals).astype(np.float32)
        for d in range(n_dev):
            # Replay the device's running offset to locate each slot's
            # segment in the compacted stream; fall back to dense
            # recompute per overflowing tile, or for the whole device-
            # stage if the stream itself overflowed (clobbered writes).
            segs = []  # (g, off, stored)
            off = 0
            clobbered = False
            for s in range(slots):
                g = d + s * n_dev
                if g > cb or g >= nblocks_real:
                    continue
                c = int(cnts[d * slots + s])
                stored = min(c, cap)
                if stored and off > stage_cap - cap:
                    clobbered = True
                segs.append((g, c, off))
                off += stored
            if clobbered:
                logger.warning(
                    "row-sharded screen: stage %d device %d stream "
                    "overflow (%d hits > %d); dense recompute",
                    cb, d, off, stage_cap,
                )
            base_i = d * stage_cap
            for g, c, soff in segs:
                if clobbered or c > cap:
                    gi, gj, v = _dense_tile_hits(
                        packed, sizes_pad, n, w, bits, g, cb, block,
                        min_cont_static, dtname=dtn,
                    )
                    emit(gi, gj, v)
                else:
                    gi = ii[base_i + soff : base_i + soff + c] + g * block
                    gj = jj[base_i + soff : base_i + soff + c] + cb * block
                    emit(gi, gj, vals[base_i + soff : base_i + soff + c])

    pending: deque = deque()
    for cb in range(nblocks_real):
        outs = fn(
            x_all, s_all, bits_dev, min_cont_dev, jnp.int32(cb), nblocks_dev
        )
        pending.append((cb, outs))
        if len(pending) > DISPATCH_WINDOW:
            collect(*pending.popleft())
    while pending:
        collect(*pending.popleft())

    if pairs:
        return ScreenResult(np.concatenate(pairs), np.concatenate(anis))
    return ScreenResult(np.empty((0, 2), np.int64), np.empty(0, np.float32))


def sharded_screen_triangle(
    indicators: np.ndarray,
    sizes: np.ndarray,
    k: int,
    min_containment: float,
    mesh: Optional[Mesh] = None,
) -> ScreenResult:
    """Dense 0/1 indicator convenience wrapper: packs rows into uint32
    bitmaps and runs the tiled sharded sweep."""
    indicators = np.asarray(indicators)
    n, bits = indicators.shape
    if bits % 32 != 0:
        raise ValueError(f"indicator width {bits} not a multiple of 32")
    packed = np.packbits(
        indicators.astype(bool), axis=1, bitorder="little"
    ).view(np.uint32)
    return sharded_screen_triangle_packed(
        list(packed), np.asarray(sizes), k, min_containment, bits, mesh=mesh
    )
