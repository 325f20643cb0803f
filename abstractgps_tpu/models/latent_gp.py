"""LatentGP — GPs under non-Gaussian likelihoods (L4).

Reference: src/latent_gp.jl:1-50. ``LatentGP(f, lik, Σy)`` pairs a GP with a
likelihood map ``lik: latent sample → observation distribution``; ``Σy`` is
the jitter under which the latent process is projected. The joint density
``logpdf(lfgp, (f, y)) = logpdf(fx, f) + logpdf(lik(f), y)`` is the hook for
MCMC/VI over latent functions (test/ppl/turing.jl:29-46 exercises this with
a Poisson likelihood under NUTS).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .finite_gp import FiniteGP
from .gp import AbstractGP

__all__ = ["LatentGP", "LatentFiniteGP"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["f", "noise_var"],
    meta_fields=["lik"],
)
@dataclasses.dataclass(frozen=True)
class LatentGP:
    """``LatentGP(f, lik, Σy)`` (src/latent_gp.jl:11-15).

    ``lik`` is a static callable (latent vector → distribution pytree);
    parameterised likelihoods close over their own parameter pytrees or use
    ``functools.partial`` — gradients wrt likelihood params flow via the
    closure when called inside a traced function.
    """

    f: AbstractGP
    lik: object
    noise_var: jax.Array

    def __init__(self, f, lik, noise_var):
        object.__setattr__(self, "f", f)
        object.__setattr__(self, "lik", lik)
        object.__setattr__(self, "noise_var", jnp.asarray(noise_var, dtype=float))

    def __call__(self, x) -> "LatentFiniteGP":
        # (lgp::LatentGP)(x) projects with jitter (src/latent_gp.jl:30)
        return LatentFiniteGP(self.f(x, self.noise_var), self.lik)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["fx"],
    meta_fields=["lik"],
)
@dataclasses.dataclass(frozen=True)
class LatentFiniteGP:
    """``LatentFiniteGP(fx, lik)`` (src/latent_gp.jl:25-28)."""

    fx: FiniteGP
    lik: object

    def __len__(self) -> int:
        return len(self.fx)

    def rand(self, key: jax.Array):
        """Joint sample ``(f=latent, y=observation)`` (src/latent_gp.jl:34-38)."""
        kf, ky = jax.random.split(key)
        f = self.fx.rand(kf)
        y = self.lik(f).sample(ky)
        return {"f": f, "y": y}

    def logpdf(self, fy) -> jax.Array:
        """Joint log density log p(y, f; x) (src/latent_gp.jl:48-50).

        ``fy`` is a mapping with keys 'f' (latent values) and 'y'
        (observations).
        """
        f, y = fy["f"], fy["y"]
        return self.fx.logpdf(f) + jnp.sum(self.lik(f).logpdf(y))
