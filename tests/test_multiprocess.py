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


def test_two_process_sharded_screen():
    worker = os.path.join(os.path.dirname(__file__), "mp_screen_worker.py")
    port = str(_free_port())
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", port],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"
    assert any("MP_OK proc=0" in o for o in outs)
    assert any("MP_OK proc=1" in o for o in outs)
