"""Multi-host layer (parallel/multihost.py) validated with REAL processes.

Spawns 2 separate Python processes (CPU backend, 2 forced devices each),
joins them through jax.distributed, and checks the full fan-out surface —
mesh locality, cross-host psum, host-local<->global round trip, broadcast
— inside tests/multihost_worker.py. The reference has no multi-process
execution at all (SURVEY.md §2.9); this is the DCN half of the scaling
story (the ICI half is tests/test_parallel.py on the virtual 8-device
mesh).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

_WORKER = Path(__file__).parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_fanout(tmp_path):
    port = _free_port()
    nproc = 2
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # fresh per-run compilation cache: concurrent first-writes from two
    # processes to the shared cache are fine, but keep isolation anyway
    env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "cache")
    env.pop("XLA_FLAGS", None)  # worker sets its own device count

    outs = [tmp_path / f"out{i}.json" for i in range(nproc)]
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", str(_WORKER), str(port), str(i),
             str(nproc), str(outs[i])],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(nproc)
    ]
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            logs.append(out.decode(errors="replace"))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out; logs:\n" + "\n".join(logs))

    for i, p in enumerate(procs):
        assert p.returncode == 0, (
            f"worker {i} rc={p.returncode}\n{logs[i] if i < len(logs) else ''}"
        )

    results = [json.loads(o.read_text()) for o in outs]
    for r in results:
        assert r["ok"], r
        assert r["n_global"] == 4 and r["n_local"] == 2
        assert r["mesh_shape"] == {"dp": 2, "tp": 2}
        assert r["psum"] == r["psum_expected"] == 10.0
        assert r["broadcast"] == 3.0
