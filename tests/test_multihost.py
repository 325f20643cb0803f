"""Multi-process (multi-host stand-in) integration: 2 OS processes, 8
global devices, real cross-process collectives (SURVEY §5 "Distributed
communication backend"; BASELINE "N≥2 hosts" axis).

Launches tests/multihost_worker.py twice with a local coordinator; each
rank runs dp-sharded training, chain-sharded NUTS, and tp-sharded exact
logpdf over meshes that SPAN the process boundary, then both ranks' results
are checked for (a) cross-rank agreement — SPMD determinism — and (b)
correctness against in-process oracles.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import abstractgps_tpu  # noqa: F401  (import check before spawning)

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(nproc: int = 2, timeout: int = 420):
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", _WORKER, str(r), str(nproc), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for r in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out))
    return outs


@pytest.mark.slow
def test_two_process_spmd_end_to_end():
    outs = _run_workers()
    results = []
    for rc, out in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out[-4000:]}"
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"no RESULT line:\n{out[-4000:]}"
        results.append(json.loads(lines[-1][len("RESULT "):]))

    r0, r1 = results
    # (a) SPMD determinism: both ranks computed identical global results
    assert r0 == r1, (r0, r1)

    # (b) correctness oracles
    # dp-sharded linear fit converged to a sensible slope and low loss
    assert r0["fit_loss"] < 0.5
    # chain-sharded NUTS recovered the diagonal-normal target moments
    np.testing.assert_allclose(r0["nuts_mean"], [0.0, 0.0, 0.0], atol=0.35)
    np.testing.assert_allclose(r0["nuts_var"], [1.0, 4.0, 0.25], rtol=0.5)
    # tp-sharded logpdf == dense logpdf across the process boundary
    np.testing.assert_allclose(r0["sharded_logpdf"], r0["dense_logpdf"],
                               rtol=1e-10)
