"""Checkpoint round-trips for posterior caches and parameter trees
(SURVEY §5: checkpoint/resume = orbax serialization of the caches the
reference keeps in memory)."""

import jax
import jax.numpy as jnp
import numpy as np

import abstractgps_tpu as agp
from abstractgps_tpu import params as P
from abstractgps_tpu.utils import checkpoint as ckpt


def test_posterior_cache_roundtrip(tmp_path, key):
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (20, 2))
    f = agp.GP(agp.Matern32Kernel())
    y = f(x, 0.1).rand(k2)
    post = agp.posterior(f(x, 0.1), y)

    ckpt.save(str(tmp_path / "cache"), post.data)
    restored = ckpt.restore(str(tmp_path / "cache"), post.data)

    for a, b in zip(
        jax.tree_util.tree_leaves(post.data),
        jax.tree_util.tree_leaves(restored),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a posterior rebuilt from the restored cache predicts identically
    post2 = agp.PosteriorGP(f, type(post.data)(*jax.tree_util.tree_leaves(restored)))
    np.testing.assert_allclose(
        np.asarray(post2.mean(x)), np.asarray(post.mean(x)), rtol=1e-12
    )


def test_param_tree_roundtrip(tmp_path):
    theta = {
        "ell": P.positive(1.5),
        "z": P.real(jnp.arange(6.0).reshape(3, 2)),
    }
    ckpt.save(str(tmp_path / "theta"), theta)
    back = ckpt.restore(str(tmp_path / "theta"), theta)
    np.testing.assert_allclose(
        np.asarray(P.constrain(back)["ell"]), 1.5, rtol=1e-12
    )
    np.testing.assert_array_equal(np.asarray(back["z"]), np.asarray(theta["z"]))
