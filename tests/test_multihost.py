"""Multi-process (multi-host) runtime test: 2 OS processes x 3 virtual
CPU devices form one global 6-device face mesh; the tiled C12 SPMD
step must match the single-device path bit-for-bit on each process's
shards (the jax.distributed equivalent of the reference's
mpirun -n 6xy launch, segmented_run/run.py:36-50; VERDICT r3 item 5)."""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_spmd_step_bitwise():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_worker.py")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(worker))
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"proc {pid} rc={p.returncode}\n{out[-4000:]}"
        )
        assert f"proc {pid}: MULTIHOST-OK" in out, out[-2000:]
    # the two processes own disjoint face triplets
    assert "faces=[0, 1, 2]" in outs[0]
    assert "faces=[3, 4, 5]" in outs[1]
