"""Per-dispatch overhead of the pair-table verify through the relay.

The round-4 2048-genome e2e spends ~43s in verify while the kernel's
measured compute for the same pair count is a few seconds. Hypothesis:
the ~107 pair-table dispatches (134 directed 62.5k-hash pairs each at
the 2^23 flat cap) pay a per-dispatch relay cost far above the ~25ms
dispatch latency the round-1 notes measured for simple kernels. This
probe times, on the real chip:

  1. one warm dispatch repeated IN-JIT (pure device compute / dispatch)
  2. N back-to-back async host-issued dispatches + final fetch
     (production's issue-then-collect pattern)

(2)/N - (1) is the true per-dispatch overhead production pays; if it
dominates, raising max_flat_hashes (fewer, bigger dispatches) is the
lever. Run on the TPU (no GALAH_TPU_PLATFORM=cpu); one process.
"""

import os
import sys
import time

# Do NOT rely on PYTHONPATH for TPU runs (axon plugin breaks); insert.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/galah_tpu/jax"),
)


def main() -> None:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from galah_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    print(f"backend: {jax.default_backend()}", file=sys.stderr, flush=True)

    from galah_tpu.ops.pair_table import (
        PairTableConfig,
        _pair_table_kernel,
        flat_domain_shapes,
    )

    flat_cap = int(os.environ.get("GALAH_TPU_PROBE_FLATCAP", str(1 << 23)))
    cfg = PairTableConfig(
        member_bits=1 << 22, k=15, min_fragment_hashes=8,
        min_fragment_identity=0.8, max_flat_hashes=flat_cap,
    )
    W = cfg.member_bits // 32
    HASHES = 62_500       # 500kb genome at fragment scale 8
    FRAGS = 167
    P_FILL = cfg.max_flat_hashes // HASHES   # pairs per dispatch (134)
    NSRC = 64

    rng = np.random.default_rng(0)
    ustream = np.zeros(max(flat_cap, 1 << 23), np.int32)  # stand-in arena
    ustream[: NSRC * HASHES] = rng.integers(0, cfg.member_bits, NSRC * HASHES)
    uoff = np.zeros((1 << 18) + 1, np.int32)
    uoff[: NSRC * FRAGS + 1] = np.arange(NSRC * FRAGS + 1) * (HASHES // FRAGS)
    bitmaps = rng.integers(0, 2**32, (256, W), dtype=np.uint32)
    popc = np.full(256, cfg.member_bits * 0.25, np.float32)

    pair_src = rng.integers(0, NSRC, cfg.max_pairs)
    pair_ref = rng.integers(0, 256, cfg.max_pairs).astype(np.int32)
    pair_src_start = (pair_src * HASHES).astype(np.int32)
    pair_ufrag_start = (pair_src * FRAGS).astype(np.int32)
    flat_start = np.minimum(
        np.arange(cfg.max_pairs + 1, dtype=np.int64) * HASHES,
        cfg.max_flat_hashes,
    ).astype(np.int32)
    fragflat_start = np.minimum(
        np.arange(cfg.max_pairs + 1, dtype=np.int64) * FRAGS,
        cfg.max_flat_frags,
    ).astype(np.int32)
    n_flat = int(P_FILL * HASHES)
    n_flat_frags = int(P_FILL * FRAGS)
    flatn, flatf = flat_domain_shapes(n_flat, n_flat_frags, cfg)
    print(f"pairs/dispatch {P_FILL}, flatn {flatn}, flatf {flatf}",
          file=sys.stderr, flush=True)

    dev = dict(
        ustream=jnp.asarray(ustream),
        uoff=jnp.asarray(uoff),
        bitmaps=jnp.asarray(bitmaps),
        popc=jnp.asarray(popc),
        pss=jnp.asarray(pair_src_start),
        fs=jnp.asarray(flat_start),
        pus=jnp.asarray(pair_ufrag_start),
        ffs=jnp.asarray(fragflat_start),
        pr=jnp.asarray(pair_ref),
        prow=jnp.asarray(pair_ref),
    )

    ops = tuple(dev[k] for k in
                ("ustream", "uoff", "bitmaps", "popc", "pss", "fs",
                 "pus", "ffs", "pr", "prow"))

    def one(nf):
        return _pair_table_kernel(
            *ops,
            jnp.int32(nf), jnp.int32(n_flat_frags),
            flatn=flatn, flatf=flatf, bits=cfg.member_bits, k=cfg.k,
            min_hashes=cfg.min_fragment_hashes,
            min_ident=cfg.min_fragment_identity,
        )

    # in-jit repeat: pure compute per dispatch. Operands are passed as
    # jit ARGUMENTS — a closure would bake them into the HLO as
    # literals and blow the remote-compile relay's request limit
    # (HTTP 413; the round-2 'R=512 does not compile' artifact).
    ITERS = 16

    @jax.jit
    def rep(nf0, *args):
        def step(i, acc):
            a, f = _pair_table_kernel(
                *args,
                nf0 + (acc.astype(jnp.int32) % 2),
                jnp.int32(n_flat_frags),
                flatn=flatn, flatf=flatf, bits=cfg.member_bits,
                k=cfg.k, min_hashes=cfg.min_fragment_hashes,
                min_ident=cfg.min_fragment_identity,
            )
            return acc + jnp.sum(a) + jnp.sum(f)

        return jax.lax.fori_loop(0, ITERS, step, jnp.float32(0.0))

    t0 = time.perf_counter()
    float(rep(jnp.int32(n_flat), *ops))
    print(f"compile+warmup {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    float(rep(jnp.int32(n_flat), *ops))
    per_injit = (time.perf_counter() - t0) / ITERS
    print(f"in-jit compute: {per_injit*1e3:.1f}ms/dispatch",
          file=sys.stderr, flush=True)

    # production pattern: N host-issued async dispatches, fetch at end
    N = 40
    float(jnp.sum(one(jnp.int32(n_flat))[0]))  # warm this call path
    t0 = time.perf_counter()
    res = []
    for i in range(N):
        res.append(one(jnp.int32(n_flat - (i % 2))))
    tot = 0.0
    for a, f in res:
        tot += float(np.asarray(a[:1])[0]) + float(np.asarray(f[:1])[0])
    per_host = (time.perf_counter() - t0) / N
    print(
        f"host-issued async: {per_host*1e3:.1f}ms/dispatch "
        f"(overhead {max(0.0, per_host-per_injit)*1e3:.1f}ms; "
        f"{P_FILL/per_host:.0f} directed-pairs/s) [{tot:.1f}]",
        file=sys.stderr, flush=True,
    )


if __name__ == "__main__":
    main()
