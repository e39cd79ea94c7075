"""Persistent-cache pre-warmer (VERDICT r4 #7).

Remote compilation costs minutes per program on relay-attached
accelerators, and a fresh deployment starts with an empty persistent
cache — so the first production run pays every compile on the
critical path (measured: 62.7s for the 8192 screen tile, 315.8s for
the device sketch kernel on this rig). This tool compiles the
production program set into the JAX persistent cache OFF the critical
path (at install/deploy), so first runs hit the cache. Shape-stable
row bucketing (ops/prefilter.py alloc_rows) keeps the screen's shape
set small enough to pre-warm.

Usage:
  python -m galah_tpu.tools.prewarm            # headline set
  python -m galah_tpu.tools.prewarm --full     # + sketch kernel sweep
  python -m galah_tpu.tools.prewarm --rows 131072 --bits 131072

Programs are compiled (lower().compile()), never executed, so no
device data is touched beyond compilation itself.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _log(msg: str) -> None:
    print(f"prewarm: {msg}", file=sys.stderr, flush=True)


def prewarm_screen(jax, jnp, rows: int, bits: int, block: int) -> int:
    """Grouped + single resident-extract programs, both diagonals."""
    import numpy as np

    from galah_tpu.ops import prefilter as pf

    cap = pf._screen_cap_for(block)
    dtn = pf._screen_dtype_name()
    group = pf._screen_tile_group()
    w = bits // 32
    x = jnp.zeros((rows, w), jnp.uint32)
    s = jnp.zeros((rows,), jnp.float32)
    n = 0
    for is_diag in (False, True):
        t0 = time.perf_counter()
        if group > 1:
            desc = jnp.asarray(pf._screen_group_desc(
                [0] * group, [0 if is_diag else 1] * group,
                float(bits), 0.5, group,
            ))
            jax.jit(
                lambda xx, ss, dd, _d=is_diag: pf._resident_screen_extract_group(
                    xx, ss, dd, block=block, cap=cap, is_diag=_d, dtname=dtn,
                )
            ).lower(x, s, desc).compile()
            n += 1
        for direct in (False, True):
            jax.jit(
                lambda xx, ss, _d=is_diag, _dr=direct: pf._resident_screen_extract(
                    xx, ss, jnp.int32(0), jnp.int32(0 if _d else 1),
                    block=block, bits_f=float(bits), min_cont=0.5,
                    cap=cap, is_diag=_d, dtname=dtn, direct=_dr,
                )
            ).lower(x, s).compile()
            n += 1
        _log(
            f"screen rows={rows} bits={bits} block={block} "
            f"diag={is_diag}: compiled in {time.perf_counter()-t0:.1f}s"
        )
    return n


def prewarm_device_sketch(jax, jnp, genome_p: int, n_genomes: int) -> int:
    """The routed sketch batch kernel at one (P, G) bucket shape —
    the most expensive cold compile on the relay (315.8s measured)."""
    import numpy as np

    from galah_tpu.ops.device_sketch import (
        _default_frag_cap,
        _default_routed,
        _psel_capacity,
        _sel_capacity,
        _sketch_batch_kernel,
        _sketch_sort_scan,
    )
    from galah_tpu.sketch.fracminhash import NativeSketchParams

    params = NativeSketchParams()
    t0 = time.perf_counter()
    P, G = genome_p, n_genomes
    nfrag = P // params.fragment_length
    NB = 1 << int(nfrag + 1).bit_length()
    SEL = _sel_capacity(P - params.k + 1, params)
    routed = _default_routed()
    codes = jnp.zeros((G, P // 4), jnp.uint8)
    inv_idx = jnp.full((G, 1), P, jnp.int32)
    lengths = jnp.full((G,), P, jnp.int32)
    bounds = jnp.zeros((G, NB), jnp.int32)
    bin2frag = jnp.zeros((G, NB), jnp.int32)
    jax.jit(
        lambda c, ii, ll, bb, bf: _sketch_batch_kernel(
            c, ii, ll, bb, bf,
            k=params.k, member_bits=params.member_bits,
            prefilter_bits=params.prefilter_bits,
            gthresh=int(params.genome_threshold),
            fthresh=int(params.fragment_threshold),
            max_frags=nfrag, max_sel=SEL,
            routed=routed,
            max_psel=_psel_capacity(P - params.k + 1, params),
            frag_cap=0 if routed else _default_frag_cap(params),
            sort_scan=routed and _sketch_sort_scan(),
        )
    ).lower(codes, inv_idx, lengths, bounds, bin2frag).compile()
    _log(
        f"device-sketch P={P} G={G}: compiled in "
        f"{time.perf_counter()-t0:.1f}s"
    )
    return 1


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows", type=int, nargs="*", default=None,
                    help="resident-matrix row buckets (default: 16384)")
    ap.add_argument("--bits", type=int, default=1 << 17,
                    help="prefilter bitmap width [default 131072]")
    ap.add_argument("--blocks", type=int, nargs="*", default=None,
                    help="screen tile edges (default: the production "
                         "choice for each row bucket)")
    ap.add_argument("--full", action="store_true",
                    help="also compile the device-sketch kernel (1Mb "
                         "genome bucket) — the most expensive cold "
                         "compile (315.8s measured on the relay rig). "
                         "The verify kernels compile in seconds and "
                         "are left to first use")
    args = ap.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/galah_tpu/jax"),
    )
    import jax
    import jax.numpy as jnp

    if os.environ.get("GALAH_TPU_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from galah_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    _log(f"backend={jax.default_backend()}")

    from galah_tpu.ops.prefilter import _screen_block_for

    rows_list = args.rows or [16384]
    total = 0
    t0 = time.perf_counter()
    for rows in rows_list:
        blocks = args.blocks or [_screen_block_for(rows)]
        for block in blocks:
            total += prewarm_screen(jax, jnp, rows, args.bits, block)
    if args.full:
        total += prewarm_device_sketch(jax, jnp, 1 << 20, 32)
    _log(
        f"done: {total} programs in the persistent cache "
        f"({time.perf_counter()-t0:.1f}s)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
