"""REAL multi-host integration: 2 jax.distributed processes (4 virtual CPU
devices each) train on one global 8-device mesh — the reference's DDP +
DistributedSampler protocol (tools/train.py:221-249, build.py:78-83)
exercised with actual cross-process collectives (Gloo), not mocks.

Complements the mocked-process unit tests in test_engine_fixes/test_data:
this spawns two interpreters, so per-host data slicing, global-batch
assembly (make_array_from_process_local_data) and loss/grad psums are the
real thing.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_training_partition_and_consistency():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # CPU-only children

    child = os.path.join(REPO, "tests", "multihost_child.py")
    procs = [subprocess.Popen(
        [sys.executable, child, str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, f"child failed:\n{err[-1500:]}"
        outs.append(out)

    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        r = json.loads(line[len("RESULT "):])
        results[r["pid"]] = r

    # every process computed the SAME global losses (replicated state +
    # cross-process collectives agree), and they are finite
    l0, l1 = results[0]["losses"], results[1]["losses"]
    assert len(l0) == len(l1) == 2
    np.testing.assert_allclose(l0, l1, rtol=0, atol=0)
    assert np.isfinite(l0).all()

    # the per-host index slices partition the epoch exactly
    # (DistributedSampler semantics)
    i0, i1 = set(results[0]["idx"]), set(results[1]["idx"])
    assert len(i0) == len(i1) == 8
    assert not (i0 & i1)
    assert i0 | i1 == set(range(16))
