"""Decompose the production screen tile: where do the non-matmul
milliseconds go, and can a lane-aligned unpack close the gap?

Motivation (round 3): the headline bench's bare int8 matmul
(8192 x 8192 output, K = 2^17 bits) runs at ~84% of the v5e's int8
peak when ops are counted for the FULL square it computes, while the
production tile (_resident_screen_extract: dynamic slice -> unpack ->
matmul -> containment -> two-level extraction) runs at ~43% — a 2x
gap the round-2 notes misread as "at the matmul bound" because the
headline counts only the N(N-1)/2 triangle pairs of the N^2 square it
executes. This probe times, at the production tile shape
(block x block output, K = bits):

  dot8        pre-materialized int8 operands, dot_general only
  fused_cur   current _unpack_bits (stack + 32-minor reshape) -> dot
  fused_bm    bit-major unpack (32 lane-aligned shifted copies
              concatenated along K; valid because both operands use
              the same order and the dot is K-permutation-invariant)
  fused_rep   repeat-based word-major unpack -> dot
  prod        full _resident_screen_extract (containment + two-level
              extraction epilogue included)

Run on the TPU (no GALAH_TPU_PLATFORM=cpu); one process at a time.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


ITERS = int(os.environ.get("GALAH_TPU_PROBE_ITERS", "4"))


def _repeat(jax, jnp, body, perturb):
    @jax.jit
    def run(x):
        def step(i, acc):
            return acc + body(perturb(x, acc % 2.0))

        return jax.lax.fori_loop(0, ITERS, step, jnp.float32(0.0))

    return run


def _time(fn, x, name):
    t0 = time.perf_counter()
    float(fn(x))
    _log(f"{name}: compile+warmup {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    float(fn(x))
    return (time.perf_counter() - t0) / ITERS


def _unpack_repeat(jnp, xw, dt):
    """(n, W) uint32 -> (n, W*32) word-major via repeat + per-lane shift."""
    n, w = xw.shape
    xr = jnp.repeat(xw, 32, axis=1)
    shifts = (
        jnp.arange(w * 32, dtype=jnp.uint32) & jnp.uint32(31)
    )[None, :]
    return ((xr >> shifts) & jnp.uint32(1)).astype(dt)


def main() -> None:
    import jax

    # sitecustomize pins jax_platforms=axon; env var alone cannot
    # override it (CLAUDE.md) — honor GALAH_TPU_PLATFORM=cpu like the
    # CLI and bench.py do.
    if os.environ.get("GALAH_TPU_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from galah_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    from galah_tpu.ops.packed_matmul import _unpack_bitmajor
    from galah_tpu.ops.prefilter import (
        _resident_screen_extract,
        _screen_cap_for,
        _screen_matmul,
        _unpack_bits,
    )

    BLOCK = int(os.environ.get("GALAH_TPU_PROBE_BLOCK", "4096"))
    B = 1 << int(os.environ.get("GALAH_TPU_PROBE_LOGBITS", "17"))
    W = B // 32
    stages = os.environ.get(
        "GALAH_TPU_PROBE_STAGES",
        "dot8,fused_cur,fused_bm,fused_rep,pallas,prod",
    ).split(",")
    _log(f"probe: block={BLOCK} bits={B} iters={ITERS} "
         f"backend={jax.default_backend()}")

    key = jax.random.PRNGKey(0)

    @jax.jit
    def mk_packed(key):
        return jax.random.randint(
            key, (2 * BLOCK, W), 0, 2**31 - 1, jnp.int32
        ).astype(jnp.uint32)

    xp = mk_packed(key)
    xp.block_until_ready()

    @jax.jit
    def mk_int8(key):
        return jax.random.bernoulli(key, 0.1, (2 * BLOCK, B)).astype(jnp.int8)

    ops_per = 2.0 * BLOCK * BLOCK * B

    def report(name, dt):
        _log(
            f"{name}: {dt*1e3:.2f}ms  "
            f"{ops_per/dt/1e12:.1f} TOPS ({ops_per/dt/394e12*100:.0f}% peak)  "
            f"{BLOCK*BLOCK/dt/1e6:.0f}M pairs-computed/s"
        )

    # --- dot only, pre-materialized int8 ---
    if "dot8" in stages:
        x8 = mk_int8(key)
        x8.block_until_ready()

        def dot8(x):
            c = _screen_matmul(x[:BLOCK], x[BLOCK:])
            return jnp.sum(c) * 1e-9

        report("dot8", _time(
            _repeat(jax, jnp, dot8,
                    lambda x, b: x.at[0, 0].set(b.astype(jnp.int8))),
            x8, "dot8"))
        del x8

    # --- fused unpack -> dot variants (packed inputs) ---
    def fused(unpack):
        def body(x):
            a = unpack(x[:BLOCK])
            bm = unpack(x[BLOCK:])
            return jnp.sum(_screen_matmul(a, bm)) * 1e-9
        return body

    variants = {
        "fused_cur": lambda xw: _unpack_bits(xw, jnp.int8),
        "fused_bm": lambda xw: _unpack_bitmajor(xw, jnp.int8),
        "fused_rep": lambda xw: _unpack_repeat(jnp, xw, jnp.int8),
    }
    for name, up in variants.items():
        if name not in stages:
            continue
        try:
            report(name, _time(
                _repeat(jax, jnp, fused(up),
                        lambda x, b: x.at[0, 0].set(b.astype(jnp.uint32))),
                xp, name))
        except Exception as e:  # noqa: BLE001 — probe records failures
            _log(f"{name}: FAILED {type(e).__name__}: {e}")

    # --- Pallas fused unpack+matmul (packed operands never expand
    # into HBM) at a few tile configs ---
    from galah_tpu.ops.packed_matmul import packed_intersect_matmul

    pallas_cfgs = (
        ((512, 512, 128), (1024, 1024, 128), (512, 1024, 256))
        if "pallas" in stages else ()
    )
    for tm, tn, kw in pallas_cfgs:
        name = f"pallas_{tm}x{tn}x{kw*32}"

        def pallas_body(x, tm=tm, tn=tn, kw=kw):
            c = packed_intersect_matmul(
                x[:BLOCK], x[BLOCK:], tm=tm, tn=tn, kw=kw
            )
            return jnp.sum(c).astype(jnp.float32) * 1e-9

        try:
            report(name, _time(
                _repeat(jax, jnp, pallas_body,
                        lambda x, b: x.at[0, 0].set(b.astype(jnp.uint32))),
                xp, name))
        except Exception as e:  # noqa: BLE001 — probe records failures
            _log(f"{name}: FAILED {type(e).__name__}: {e}")

    # --- full production tile ---
    if "prod" not in stages:
        return
    sizes = jnp.full((2 * BLOCK,), B * 0.1, jnp.float32)
    cap = _screen_cap_for(BLOCK)

    def prod(x):
        cnt, ii, jj, vals = _resident_screen_extract(
            x, sizes, jnp.int32(0), jnp.int32(1),
            jnp.float32(B), jnp.float32(0.9),
            block=BLOCK, cap=cap, is_diag=False, dtname="int8",
        )
        return (
            cnt.astype(jnp.float32)
            + jnp.sum(ii).astype(jnp.float32) * 1e-9
            + jnp.sum(vals).astype(jnp.float32)
        )

    report("prod", _time(
        _repeat(jax, jnp, prod,
                lambda x, b: x.at[0, 0].set(b.astype(jnp.uint32))),
        xp, "prod"))


if __name__ == "__main__":
    main()
