"""Worker for the 2-process integration test (tests/test_multihost.py).

Each OS process joins the jax.distributed runtime with 4 virtual CPU
devices (8 global), builds a host-aware pod mesh, and runs the three
multi-host workloads the BASELINE north star names: dp-sharded training,
chain-sharded NUTS, and tp-sharded exact logpdf — collectives crossing a
real process boundary (Gloo on CPU; ICI/DCN on a pod). Prints one JSON
line of results; the parent asserts both ranks agree with the
single-process oracle.
"""

import json
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
os.environ["JAX_NUM_PROCESSES"] = str(nproc)
os.environ["JAX_PROCESS_ID"] = str(pid)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from abstractgps_tpu.parallel.multihost import (  # noqa: E402
    initialize_distributed,
    is_distributed,
    make_pod_mesh,
)

initialize_distributed()
assert is_distributed(), "expected a multi-process runtime"
assert jax.process_count() == nproc
assert len(jax.devices()) == 4 * nproc

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from jax.experimental import multihost_utils  # noqa: E402

import abstractgps_tpu as agp  # noqa: E402
from abstractgps_tpu.inference.mcmc import init_chain_positions, run_mcmc  # noqa: E402
from abstractgps_tpu.parallel import fit_sharded  # noqa: E402
from abstractgps_tpu.parallel.sharded_linalg import sharded_logpdf  # noqa: E402

out = {}

# --- 1. dp-sharded training across processes ------------------------------
rng = np.random.default_rng(0)
n = 64
x = jnp.asarray(rng.uniform(size=(n, 1)))
y = jnp.asarray(np.sin(3 * np.asarray(x)[:, 0]) + 0.1 * rng.normal(size=n))

mesh_dp = make_pod_mesh(("dp",))


def loss(theta, data):
    xx, yy = data
    pred = theta["w"] * xx[:, 0] + theta["b"]
    return jnp.mean(jnp.square(pred - yy))


res = fit_sharded(
    loss, {"w": jnp.asarray(0.0), "b": jnp.asarray(0.0)}, (x, y), mesh_dp,
    num_steps=200, optimizer=optax.adam(0.1),
)
# replicated outputs: every process holds a full copy — read the local one
out["fit_w"] = float(np.asarray(res.params["w"].addressable_data(0)))
out["fit_loss"] = float(np.asarray(res.history.addressable_data(0))[-1])

# --- 2. chain-sharded NUTS across processes -------------------------------
def logdens(q):
    return -0.5 * jnp.sum(q * q / jnp.array([1.0, 4.0, 0.25]))


key = jax.random.PRNGKey(7)
init = init_chain_positions(key, jnp.zeros((3,)), num_chains=8)
mcmc = run_mcmc(logdens, init, key, num_chains=8, num_samples=100,
                num_warmup=100, mesh=mesh_dp, mesh_axis="dp")
# chain-sharded draws span processes: allgather to a host-global array
draws = np.asarray(multihost_utils.process_allgather(mcmc.positions,
                                                     tiled=True))
out["nuts_mean"] = [round(float(v), 10) for v in draws.mean((0, 1))]
out["nuts_var"] = [round(float(v), 10) for v in draws.var((0, 1))]

# --- 3. tp-sharded exact logpdf across processes --------------------------
mesh_tp = make_pod_mesh(("tp",))
fx = agp.GP(agp.Matern52Kernel())(x, 0.1)
slp = sharded_logpdf(fx, y, mesh_tp, block=8)
out["sharded_logpdf"] = float(np.asarray(slp.addressable_data(0)))
out["dense_logpdf"] = float(fx.logpdf(y))

print("RESULT " + json.dumps(out), flush=True)
jax.distributed.shutdown()
