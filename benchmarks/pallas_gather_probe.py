"""Go/no-go probe: can a Pallas VMEM-resident gather beat XLA's
per-index TPU gather for the verify stage? (VERDICT r2 item 5)

The verify kernel's remaining bound is the bitmap gather: XLA lowers
TPU gathers at ~60M indices/s regardless of row width (RESULTS.md
round-2 addendum 9), which caps the grouped verify at ~24K directed
MAG-pairs/s. The proposed alternative streams bucket-range tiles of
the bit-transposed table through VMEM (4MB per 2^17-bucket tile at 256
refs) with the stream pre-partitioned by a (now cheap, tiled-bitonic)
sort. Whether that wins hinges entirely on ONE number: indices/s of a
Pallas dynamic-index row gather from a VMEM-resident table. This probe
measures exactly that, for a few unroll widths, against the XLA gather
at the identical shape — publishing the number either way.

Run on the chip: python benchmarks/pallas_gather_probe.py
"""

import os
import sys

# Make the repo importable when run as `python benchmarks/<name>.py`.
# Do NOT rely on PYTHONPATH for TPU runs: on this rig the axon PJRT
# plugin fails to register when PYTHONPATH is set AT ALL (any value),
# leaving jax with "Unable to initialize backend 'axon'".
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/galah_tpu/jax"),
)

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from galah_tpu.utils.platform import enable_compile_cache  # noqa: E402

enable_compile_cache()
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

WT = 1 << 17          # words per VMEM tile (x 8 uint32 = 4MB)
RW = 8                # 256 refs / 32 bits
NS = 1 << 17          # stream indices per dispatch
ITERS = 10


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def pallas_gather(unroll: int, interpret: bool):
    def kernel(idx_ref, table_ref, out_ref):
        def body(i, acc):
            for u in range(unroll):
                acc = acc ^ table_ref[idx_ref[i * unroll + u], :]
            return acc

        out_ref[0, :] = jax.lax.fori_loop(
            0, NS // unroll, body, jnp.zeros((RW,), jnp.uint32)
        )

    @jax.jit
    def run(idx, table):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, RW), jnp.uint32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(idx, table)

    return run


def pallas_gather_chains(unroll: int, interpret: bool):
    """Round-5 variant (VERDICT r4 #5): the original probe XORs every
    gathered row into ONE accumulator, so the whole loop is a serial
    dependence chain — what it measured may be loop-carried LATENCY,
    not the issue rate. Here each unroll lane keeps its own
    independent accumulator (combined once at the end), exposing
    `unroll` independent gather chains to the scheduler. If the bound
    was dependence latency, throughput should scale with unroll and
    the two-level VMEM design comes back on the table; if it stays
    flat, the per-index scalar-issue bound is confirmed as real."""
    def kernel(idx_ref, table_ref, out_ref):
        def body(i, accs):
            return tuple(
                accs[u] ^ table_ref[idx_ref[i * unroll + u], :]
                for u in range(unroll)
            )

        accs = jax.lax.fori_loop(
            0, NS // unroll, body,
            tuple(jnp.zeros((RW,), jnp.uint32) for _ in range(unroll)),
        )
        out = accs[0]
        for u in range(1, unroll):
            out = out ^ accs[u]
        out_ref[0, :] = out

    @jax.jit
    def run(idx, table):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, RW), jnp.uint32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(idx, table)

    return run


def main():
    interpret = jax.default_backend() == "cpu"
    _log(f"backend={jax.default_backend()}")
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (NS,), 0, WT, jnp.int32)
    table = jax.random.randint(
        key, (WT, RW), 0, 2**31 - 1, jnp.int32
    ).astype(jnp.uint32)
    idx.block_until_ready()

    # XLA reference gather at the identical shape (row gather from the
    # same table), repeat-in-jit so dispatch latency is excluded.
    @jax.jit
    def xla_run(idx, table):
        def step(i, acc):
            rows = table[jnp.clip(idx + (acc[0] % 2).astype(jnp.int32), 0, WT - 1)]
            return acc ^ jnp.sum(rows, axis=0, dtype=jnp.uint32)

        return jax.lax.fori_loop(
            0, ITERS, step, jnp.zeros((RW,), jnp.uint32)
        )

    t0 = time.perf_counter()
    np.asarray(xla_run(idx, table))
    _log(f"xla gather compile {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    np.asarray(xla_run(idx, table))
    dt = (time.perf_counter() - t0) / ITERS
    _log(f"xla gather: {NS / dt / 1e6:.1f}M idx/s ({dt*1e3:.2f}ms)")

    for maker, unrolls, tag in (
        (pallas_gather, (1, 4, 8), "serial"),
        (pallas_gather_chains, (8, 16, 32), "chains"),
    ):
      for unroll in unrolls:
        try:
            fn = maker(unroll, interpret)

            @jax.jit
            def rep(idx, table, fn=fn):
                def step(i, acc):
                    out = fn(
                        jnp.clip(
                            idx + (acc[0, 0] % 2).astype(jnp.int32),
                            0, WT - 1,
                        ),
                        table,
                    )
                    return acc ^ out

                return jax.lax.fori_loop(
                    0, ITERS, step, jnp.zeros((1, RW), jnp.uint32)
                )

            t0 = time.perf_counter()
            np.asarray(rep(idx, table))
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(rep(idx, table))
            dt = (time.perf_counter() - t0) / ITERS
            _log(
                f"pallas gather[{tag}] unroll={unroll}: "
                f"{NS / dt / 1e6:.1f}M idx/s "
                f"({dt*1e3:.2f}ms, compile {comp:.0f}s)"
            )
        except Exception as e:
            _log(f"pallas gather[{tag}] unroll={unroll} failed: {e!r}")


if __name__ == "__main__":
    main()
