"""True multi-process sharded screen: two JAX processes (gloo over
localhost, the CPU stand-in for a multi-host DCN) each holding two
devices of a 4-device global mesh. Only sparse chunk results cross the
process boundary (parallel/distance.py process_allgather path); both
processes must recover exactly the planted pairs.

This is the SURVEY §2.3 P11 / §5 distributed-comm path that round 1
never exercised with more than one process."""

import os
import socket
import subprocess
import sys


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(nprocs: int) -> None:
    worker = os.path.join(os.path.dirname(__file__), "mp_screen_worker.py")
    port = str(_free_port())
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(nprocs), port],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(nprocs)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"
    for pid in range(nprocs):
        assert any(f"MP_OK proc={pid}" in o for o in outs)


def test_two_process_sharded_screen():
    _run_workers(2)


def test_four_process_sharded_screen():
    """The >=4-host north-star shape (BASELINE.md config #5): 4 JAX
    processes x 2 devices, both the tiled and the row-sharded sweeps."""
    _run_workers(4)


def _run_e2e(tmp_path, nprocs: int) -> None:
    """Full pipeline across real JAX processes: partitioned sketching,
    sharded screen, and partitioned verify; every process must recover
    the planted families exactly."""
    sys.path.insert(0, os.path.dirname(__file__))
    from galah_tpu.utils.synth import make_families

    corpus = tmp_path / "corpus"
    make_families(
        str(corpus), n_families=3, members_per_family=3,
        genome_length=30_000, within_ani=0.97, seed=7,
    )
    worker = os.path.join(os.path.dirname(__file__), "mp_verify_worker.py")
    port = str(_free_port())
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(nprocs), port, str(corpus)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(nprocs)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"
    for pid in range(nprocs):
        assert any(f"MP_VERIFY_OK proc={pid}" in o for o in outs)
    # Positive evidence the sketch partition actually engaged (each
    # process sketched a share and exchanged, rather than silently
    # falling back to sketching everything).
    assert any(
        f"exchanging across {nprocs} processes" in o for o in outs
    ), "multi-process sketch partition never ran"


def test_two_process_end_to_end_dereplication(tmp_path):
    _run_e2e(tmp_path, 2)


def test_four_process_end_to_end_dereplication(tmp_path):
    """The >=4-host north-star shape with the full pipeline."""
    _run_e2e(tmp_path, 4)
