"""Pallas kernel correctness in interpreter mode (CPU stand-in for TPU).

The Pallas gram / Cholesky / TRSM kernels are exact re-implementations of
the XLA formulations; these tests pin them against the lax.linalg /
kernelmatrix baselines (values and gradients), including the padding and
vmap paths the samplers rely on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from abstractgps_tpu.ops import covmat, pallas_chol, pallas_gram


@pytest.fixture(autouse=True)
def _interpret_mode():
    pallas_chol.set_interpret(True)
    pallas_gram.set_interpret(True)
    yield
    pallas_chol.set_interpret(False)
    pallas_gram.set_interpret(False)


def _spd(rng, n, dtype=jnp.float32):
    X = rng.normal(size=(n, n + 8))
    A = X @ X.T / (n + 8) + 0.5 * np.eye(n)
    return jnp.asarray(A, dtype=dtype)


# ---------------------------------------------------------------------------
# blocked Cholesky
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [64, 200, 300])
def test_blocked_cholesky_matches_lax(rng, n):
    A = _spd(rng, n)
    L = pallas_chol._blocked_cholesky_impl(A, block=64)
    L_ref = jax.lax.linalg.cholesky(A)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref), atol=2e-5)
    # strictly lower-triangular output
    assert np.allclose(np.triu(np.asarray(L), 1), 0.0)


def test_pallas_cholesky_default_block_and_padding(rng):
    # n=200 forces the pad-to-256 path of the production entry point
    A = _spd(rng, 200)
    L = pallas_chol.pallas_cholesky(A)
    L_ref = jax.lax.linalg.cholesky(A)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref), atol=2e-5)


@pytest.mark.slow
def test_pallas_cholesky_grad_matches_lax(rng):
    A = _spd(rng, 96)

    def logdet_pallas(A):
        L = pallas_chol._blocked_cholesky_impl(
            0.5 * (A + A.T), block=32
        )
        return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))

    # route through the custom_jvp entry point for the AD rule under test
    def logdet_custom(A):
        L = pallas_chol.pallas_cholesky(0.5 * (A + A.T))
        return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))

    def logdet_ref(A):
        L = jax.lax.linalg.cholesky(0.5 * (A + A.T))
        return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))

    g_pallas = jax.grad(logdet_custom)(A)
    g_ref = jax.grad(logdet_ref)(A)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref),
                               atol=5e-4, rtol=5e-4)
    # forward mode through the same custom rule
    V = jnp.asarray(np.asarray(_spd(np.random.default_rng(1), 96)))
    _, t_pallas = jax.jvp(logdet_custom, (A,), (V,))
    _, t_ref = jax.jvp(logdet_ref, (A,), (V,))
    np.testing.assert_allclose(float(t_pallas), float(t_ref), rtol=1e-4)
    del logdet_pallas


def test_pallas_cholesky_vmap(rng):
    # NUTS vmaps the chain axis straight through cholesky_lower
    As = jnp.stack([_spd(rng, 64) for _ in range(3)])
    Ls = jax.vmap(lambda A: pallas_chol._blocked_cholesky_impl(A, block=32))(As)
    L_ref = jax.vmap(jax.lax.linalg.cholesky)(As)
    np.testing.assert_allclose(np.asarray(Ls), np.asarray(L_ref), atol=2e-5)


def test_cholesky_lower_dispatch(rng, monkeypatch):
    # with the size gate lowered, cholesky_lower routes to the Pallas path
    monkeypatch.setattr(pallas_chol, "_MIN_N", 32)
    monkeypatch.setattr(pallas_chol, "_BLOCK", 32)
    A = _spd(rng, 80)
    assert pallas_chol.should_use_pallas(A)
    L = covmat.cholesky_lower(A)
    np.testing.assert_allclose(
        np.asarray(L), np.asarray(jax.lax.linalg.cholesky(A)), atol=2e-5
    )
    # f64 input never dispatches to the f32 kernel
    assert not pallas_chol.should_use_pallas(A.astype(jnp.float64))


def test_pallas_cholesky_reads_only_lower_triangle(rng):
    # the documented Symmetric-view contract (covmat.cholesky_lower):
    # garbage in the upper triangle must not affect the factorization
    A = _spd(rng, 96)
    garbage = jnp.triu(
        jnp.asarray(rng.normal(size=(96, 96)) * 1e3, jnp.float32), 1
    )
    A_dirty = jnp.tril(A) + garbage
    L = pallas_chol._blocked_cholesky_impl(A_dirty, block=32)
    L_ref = jax.lax.linalg.cholesky(A)
    assert not bool(jnp.isnan(L).any())
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref), atol=2e-5)


def test_non_psd_propagates_nan(rng):
    A = _spd(rng, 64) - 10.0 * jnp.eye(64, dtype=jnp.float32)
    L = pallas_chol._blocked_cholesky_impl(A, block=32)
    assert bool(jnp.isnan(L).any())


# ---------------------------------------------------------------------------
# fused gram → Cholesky (K never materialised)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [96, 150])  # 150 exercises pad-to-block
@pytest.mark.slow
def test_cholesky_gram_matches_build_then_factor(rng, n, monkeypatch):
    import abstractgps_tpu as agp

    monkeypatch.setattr(pallas_chol, "_BLOCK", 32)
    x = jnp.asarray(rng.uniform(size=(n, 2)), dtype=jnp.float32)
    nd = jnp.asarray(rng.uniform(0.1, 0.5, size=(n,)), dtype=jnp.float32)
    k = jnp.float32(1.4) * agp.with_lengthscale(
        agp.Matern52Kernel(), jnp.float32(0.7)
    )
    L = pallas_chol.cholesky_gram(k, x, nd)
    K = agp.kernelmatrix(k, x) + jnp.diag(nd)
    L_ref = jax.lax.linalg.cholesky(K)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref),
                               atol=2e-5, rtol=2e-5)
    assert np.allclose(np.triu(np.asarray(L), 1), 0.0)


@pytest.mark.slow
def test_cholesky_gram_grad_matches_unfused(rng, monkeypatch):
    import abstractgps_tpu as agp

    monkeypatch.setattr(pallas_chol, "_BLOCK", 32)
    n = 80
    x = jnp.asarray(rng.uniform(size=(n, 2)), dtype=jnp.float32)
    y = jnp.asarray(rng.normal(size=(n,)), dtype=jnp.float32)

    def logpdf_terms(L):
        z = jax.lax.linalg.triangular_solve(
            L, y[:, None], left_side=True, lower=True
        )[:, 0]
        return -(jnp.sum(jnp.log(jnp.diagonal(L))) + 0.5 * jnp.dot(z, z))

    def fused(params):
        k = params["s2"] * agp.with_lengthscale(agp.SEKernel(), params["ell"])
        return logpdf_terms(pallas_chol.cholesky_gram(k, x, params["nd"]))

    def unfused(params):
        k = params["s2"] * agp.with_lengthscale(agp.SEKernel(), params["ell"])
        K = agp.kernelmatrix(k, x) + jnp.diag(params["nd"])
        return logpdf_terms(jax.lax.linalg.cholesky(K))

    params = {
        "s2": jnp.float32(1.2),
        "ell": jnp.float32(0.6),
        "nd": jnp.asarray(rng.uniform(0.1, 0.3, size=(n,)), jnp.float32),
    }
    v_f, g_f = jax.value_and_grad(fused)(params)
    v_u, g_u = jax.value_and_grad(unfused)(params)
    np.testing.assert_allclose(float(v_f), float(v_u), rtol=1e-5)
    # f64 oracle: the honest bound for an f32 production path. The fused
    # VJP's per-component error vs f64 truth is ≤ ~1% (measured: ell/nd
    # components BEAT the unfused-f32 path; the small-magnitude s2
    # component carries ~0.3-1.2% correlated f32 rounding from the
    # sweep's panel solves).
    x64 = jnp.asarray(np.asarray(x), jnp.float64)
    y64 = jnp.asarray(np.asarray(y), jnp.float64)

    def unfused64(params):
        k = params["s2"] * agp.with_lengthscale(agp.SEKernel(), params["ell"])
        K = agp.kernelmatrix(k, x64) + jnp.diag(params["nd"])
        L = jax.lax.linalg.cholesky(K)
        z = jax.lax.linalg.triangular_solve(
            L, y64[:, None], left_side=True, lower=True
        )[:, 0]
        return -(jnp.sum(jnp.log(jnp.diagonal(L))) + 0.5 * jnp.dot(z, z))

    params64 = {k: jnp.asarray(np.asarray(v), jnp.float64)
                for k, v in params.items()}
    g_t = jax.grad(unfused64)(params64)
    for key_ in params:
        t = np.asarray(g_t[key_], dtype=np.float64)
        scale = np.abs(t).max() + 1e-12
        err_f = np.abs(np.asarray(g_f[key_], dtype=np.float64) - t).max()
        err_u = np.abs(np.asarray(g_u[key_], dtype=np.float64) - t).max()
        assert err_f < 2e-2 * scale, (key_, err_f, scale)
        # and no more than ~20x the unfused-f32 error on any component
        assert err_f < 20.0 * err_u + 1e-3 * scale, (key_, err_f, err_u)
    # pinned σ²-gradient rounding budget (r4 verdict #9): the correlated
    # trace-term cancellation was documented at ~2.5e-3 relative; with the
    # Neumaier-compensated scalar accumulation in logpdf_contraction
    # (measured 3.1e-4 → 2.3e-4 at N=2048 interpret) the budget is pinned
    # at 5e-3 — this FAILS if a future kernel change doubles the error
    t_s2 = float(g_t["s2"])
    err_s2 = abs(float(g_f["s2"]) - t_s2)
    assert err_s2 < 5e-3 * abs(t_s2), (err_s2, t_s2)


@pytest.mark.slow
def test_gram_logpdf_core_value_and_grad(rng, monkeypatch):
    # fused gram→chol→logpdf op with the closed-form ∂logpdf/∂K pullback:
    # value + grads (kernel params, noise, y) vs the dense formulation
    import abstractgps_tpu as agp

    monkeypatch.setattr(pallas_chol, "_MIN_N", 32)
    monkeypatch.setattr(pallas_chol, "_BLOCK", 32)
    n = 70
    x = jnp.asarray(rng.uniform(size=(n, 2)), dtype=jnp.float32)
    y = jnp.asarray(rng.normal(size=(n,)), dtype=jnp.float32)

    def make_k(p):
        return p["s2"] * agp.with_lengthscale(agp.SEKernel(), p["ell"])

    def fused(p, yv):
        return pallas_chol.gram_logpdf_core(make_k(p), x, p["nd"], yv)

    def dense(p, yv):
        K = agp.kernelmatrix(make_k(p), x) + jnp.diag(p["nd"])
        L = jax.lax.linalg.cholesky(K)
        z = jax.lax.linalg.triangular_solve(
            L, yv[:, None], left_side=True, lower=True
        )[:, 0]
        return -0.5 * (
            n * np.log(2 * np.pi)
            + 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
            + z @ z
        )

    p = {
        "s2": jnp.float32(1.3),
        "ell": jnp.float32(0.7),
        "nd": jnp.asarray(rng.uniform(0.1, 0.3, size=(n,)), jnp.float32),
    }
    v_f, g_f = jax.value_and_grad(fused, argnums=(0, 1))(p, y)
    v_d, g_d = jax.value_and_grad(dense, argnums=(0, 1))(p, y)
    np.testing.assert_allclose(float(v_f), float(v_d), rtol=1e-5)
    for key_ in p:
        np.testing.assert_allclose(
            np.asarray(g_f[0][key_]), np.asarray(g_d[0][key_]),
            rtol=2e-3, atol=2e-4,
        )
    np.testing.assert_allclose(
        np.asarray(g_f[1]), np.asarray(g_d[1]), rtol=2e-3, atol=2e-4
    )

    # matrix-Y path: per-column densities and grads through a weighted sum
    Y = jnp.asarray(rng.normal(size=(n, 3)), dtype=jnp.float32)
    w = jnp.asarray([0.5, -1.0, 2.0], dtype=jnp.float32)
    vals = pallas_chol.gram_logpdf_core(make_k(p), x, p["nd"], Y)
    assert vals.shape == (3,)
    for j in range(3):
        np.testing.assert_allclose(
            float(vals[j]), float(dense(p, Y[:, j])), rtol=1e-5
        )
    g_mat = jax.grad(
        lambda pp: jnp.dot(w, pallas_chol.gram_logpdf_core(make_k(pp), x, pp["nd"], Y))
    )(p)
    g_ref = jax.grad(
        lambda pp: sum(w[j] * dense(pp, Y[:, j]) for j in range(3))
    )(p)
    for key_ in p:
        np.testing.assert_allclose(
            np.asarray(g_mat[key_]), np.asarray(g_ref[key_]),
            rtol=2e-3, atol=2e-4,
        )


@pytest.mark.slow
def test_finite_gp_routes_through_fused_path(rng, monkeypatch):
    import abstractgps_tpu as agp

    monkeypatch.setattr(pallas_chol, "_MIN_N", 32)
    monkeypatch.setattr(pallas_chol, "_BLOCK", 32)
    n = 70
    x = jnp.asarray(rng.uniform(size=(n, 1)), dtype=jnp.float32)
    y = jnp.asarray(rng.normal(size=(n,)), dtype=jnp.float32)
    fx = agp.GP(agp.Matern32Kernel())(x, jnp.float32(0.1))
    assert pallas_chol.should_use_fused_gram(fx.x, fx.noise.diag())
    got = float(fx.logpdf(y))
    # reference value through the unfused formulation
    K = agp.kernelmatrix(agp.Matern32Kernel(), x) + jnp.float32(0.1) * jnp.eye(
        n, dtype=jnp.float32
    )
    L = jax.lax.linalg.cholesky(K)
    z = jax.lax.linalg.triangular_solve(L, y[:, None], left_side=True,
                                        lower=True)[:, 0]
    want = -0.5 * (n * np.log(2 * np.pi) + 2 * float(jnp.sum(jnp.log(jnp.diagonal(L))))
                   + float(z @ z))
    np.testing.assert_allclose(got, want, rtol=1e-5)


# ---------------------------------------------------------------------------
# blocked TRSM
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n,m", [(96, 48), (200, 33)])  # 200: pad path
def test_wide_solve_matches_xla(rng, n, m):
    # trtri+GEMM solve (the posterior-prediction whitening path): values
    # AND the custom adjoints vs XLA's triangular solve
    A = _spd(rng, n)
    L = jax.lax.linalg.cholesky(A)
    B = jnp.asarray(rng.normal(size=(n, m)), dtype=jnp.float32)

    for wide, xla_t in [(pallas_chol.solve_lower_wide, False),
                        (pallas_chol.solve_upper_wide, True)]:
        X = wide(L, B)
        X_ref = jax.lax.linalg.triangular_solve(
            L, B, left_side=True, lower=True, transpose_a=xla_t)
        np.testing.assert_allclose(np.asarray(X), np.asarray(X_ref),
                                   atol=2e-4, rtol=2e-4)
        # adjoints: same scalar loss through both implementations
        w = jnp.asarray(rng.normal(size=(n, m)), dtype=jnp.float32)
        gL, gB = jax.grad(
            lambda L_, B_: jnp.vdot(wide(L_, B_), w), argnums=(0, 1)
        )(L, B)
        gL_r, gB_r = jax.grad(
            lambda L_, B_: jnp.vdot(jax.lax.linalg.triangular_solve(
                L_, B_, left_side=True, lower=True, transpose_a=xla_t), w),
            argnums=(0, 1),
        )(L, B)
        np.testing.assert_allclose(np.asarray(jnp.tril(gL)),
                                   np.asarray(jnp.tril(gL_r)),
                                   atol=5e-3, rtol=5e-3)
        np.testing.assert_allclose(np.asarray(gB), np.asarray(gB_r),
                                   atol=5e-4, rtol=5e-3)


def test_solve_lower_dispatches_wide(rng, monkeypatch):
    monkeypatch.setattr(pallas_chol, "_MIN_N", 64)
    monkeypatch.setattr(pallas_chol, "_WIDE_RHS", 32)
    A = _spd(rng, 128)
    L = jax.lax.linalg.cholesky(A)
    B = jnp.asarray(rng.normal(size=(128, 40)), dtype=jnp.float32)
    assert pallas_chol.should_use_wide_solve(L, B)
    X = covmat.solve_lower(L, B)
    X_ref = jax.lax.linalg.triangular_solve(L, B, left_side=True, lower=True)
    np.testing.assert_allclose(np.asarray(X), np.asarray(X_ref),
                               atol=2e-4, rtol=2e-4)
    # thin RHS stays on the XLA path
    assert not pallas_chol.should_use_wide_solve(L, B[:, :4])


@pytest.mark.slow
def test_rand_gradients_through_pallas_cholesky(rng, monkeypatch):
    """Differentiation-through-sampling on the PALLAS path: fx.rand routes
    through pallas_cholesky (custom JVP) when the gate fires; FD-check the
    resulting input/hyperparameter gradients (the reference FD-checks the
    rand pullback, test/finite_gp_projection.jl:105-127). Interpret mode +
    a widened gate runs the real kernel sweep on CPU at f64, so the FD
    oracle stays tight."""
    import abstractgps_tpu as agp

    monkeypatch.setattr(pallas_chol, "should_use_pallas",
                        lambda A: A.ndim == 2 and A.shape[-1] >= 16)
    key = jax.random.PRNGKey(3)
    x = jnp.asarray(rng.standard_normal((48, 2)))  # pad path: 48 % 32 != 0
    xi_probe = jnp.asarray(rng.standard_normal(48))

    def draw(xv, ell, s2):
        k = s2 * agp.with_lengthscale(agp.Matern52Kernel(), ell)
        fx = agp.GP(k)(xv, 0.1)
        return jnp.sum(jnp.cos(fx.rand(key)) * xi_probe)

    # the gate must actually be live for this config
    K = agp.kernelmatrix(agp.Matern52Kernel(), x)
    assert pallas_chol.should_use_pallas(K)

    # tight oracle: the same draw through the lax.linalg path (gate off)
    def draw_lax(xv, ell, s2):
        pallas_chol.set_enabled(False)
        try:
            return draw(xv, ell, s2)
        finally:
            pallas_chol.set_enabled(True)

    args = [x, jnp.array(0.9), jnp.array(1.2)]
    for argnum in range(3):
        g = np.atleast_1d(np.asarray(jax.grad(draw, argnums=argnum)(*args)))
        g_lax = np.atleast_1d(np.asarray(
            jax.grad(draw_lax, argnums=argnum)(*args)))
        # AD-vs-AD at the kernel's own precision: the in-kernel dots pin
        # preferred_element_type=f32 (production is f32-only), so the two
        # paths agree to the f32 noise floor, not f64
        np.testing.assert_allclose(g, g_lax, rtol=1e-4, atol=1e-5)
        # FD on the PALLAS path itself: eps large enough that the f32
        # forward noise (~1e-7·scale) stays below the FD signal
        flat = np.atleast_1d(np.asarray(args[argnum], np.float64))
        eps = 1e-3
        idxs = range(flat.size) if flat.size <= 8 else (0, 17, 41, 95)
        for i in idxs:
            ap = [np.asarray(a, np.float64).copy() for a in args]
            am = [np.asarray(a, np.float64).copy() for a in args]
            np.reshape(ap[argnum], -1)[i] += eps
            np.reshape(am[argnum], -1)[i] -= eps
            fd = (draw(*[jnp.asarray(a) for a in ap])
                  - draw(*[jnp.asarray(a) for a in am])) / (2 * eps)
            np.testing.assert_allclose(g.reshape(-1)[i], fd,
                                       rtol=2e-2, atol=5e-3)


def test_wide_solve_ill_conditioned(rng):
    """Validate the covmat.solve_lower accuracy contract at production
    condition numbers: explicit-inverse (trtri+TRMM) vs substitution vs an
    f64 oracle on a gram with kappa(K) ~ 1e8 (SE kernel, noise 1e-6 —
    about the worst non-jitter-only case a GP user hits in f32)."""
    import scipy.spatial.distance as ssd

    n, m = 256, 64
    x = rng.uniform(size=(n, 2))
    d2 = ssd.cdist(x, x, "sqeuclidean")
    K64 = np.exp(-0.5 * d2 / 0.5**2) + 1e-6 * np.eye(n)
    kappa = np.linalg.cond(K64)
    assert kappa > 1e6  # the test must actually be ill-conditioned
    L64 = np.linalg.cholesky(K64)
    B64 = rng.normal(size=(n, m))
    X64 = np.linalg.solve(L64, B64)  # f64 oracle

    L = jnp.asarray(L64, jnp.float32)
    B = jnp.asarray(B64, jnp.float32)
    X_wide = np.asarray(pallas_chol.solve_lower_wide(L, B), np.float64)
    X_sub = np.asarray(jax.lax.linalg.triangular_solve(
        L, B, left_side=True, lower=True), np.float64)

    def relerr(X):
        return np.linalg.norm(X - X64) / np.linalg.norm(X64)

    # contract (covmat.solve_lower docstring): kappa(L) = sqrt(kappa(K))
    # ~ 1e4 here, so the wide path's extra error stays ~1e-4..1e-3 relative
    # and within ~10x of substitution's own f32 error
    assert relerr(X_wide) < 2e-3, (relerr(X_wide), kappa)
    assert relerr(X_wide) < 10 * max(relerr(X_sub), 1e-6)


def test_substitution_solves_scoped_optout(rng, monkeypatch):
    """covmat.substitution_solves() must force the XLA substitution path
    even where the wide-RHS gate would fire, and restore routing on exit."""
    monkeypatch.setattr(pallas_chol, "_MIN_N", 64)
    monkeypatch.setattr(pallas_chol, "_WIDE_RHS", 32)
    A = _spd(rng, 128)
    L = jax.lax.linalg.cholesky(A)
    B = jnp.asarray(rng.normal(size=(128, 40)), dtype=jnp.float32)
    assert pallas_chol.should_use_wide_solve(L, B)

    calls = []
    orig = pallas_chol.solve_lower_wide
    monkeypatch.setattr(pallas_chol, "solve_lower_wide",
                        lambda *a: calls.append(1) or orig(*a))
    with covmat.substitution_solves():
        X_sub = covmat.solve_lower(L, B)
    assert not calls  # wide path never invoked inside the context
    X_wide = covmat.solve_lower(L, B)
    assert calls  # routing restored on exit
    np.testing.assert_allclose(np.asarray(X_sub), np.asarray(X_wide),
                               atol=2e-4, rtol=2e-4)


# ---------------------------------------------------------------------------
# fused gram kernel
# ---------------------------------------------------------------------------


def test_fused_gram_symmetric_and_cross(rng):
    import abstractgps_tpu as agp

    x = jnp.asarray(rng.uniform(size=(40, 3)), dtype=jnp.float32)
    z = jnp.asarray(rng.uniform(size=(24, 3)), dtype=jnp.float32)
    k = agp.Matern32Kernel()
    K = pallas_gram.fused_isotropic_gram(k._apply_sqdist, x, x, symmetric=True)
    np.testing.assert_allclose(
        np.asarray(K), np.asarray(agp.kernelmatrix(k, x)), atol=1e-5
    )
    Kxz = pallas_gram.fused_isotropic_gram(k._apply_sqdist, x, z)
    np.testing.assert_allclose(
        np.asarray(Kxz), np.asarray(agp.kernelmatrix(k, x, z)), atol=1e-5
    )


@pytest.mark.slow
def test_fused_gram_grad(rng):
    import abstractgps_tpu as agp

    x = jnp.asarray(rng.uniform(size=(16, 2)), dtype=jnp.float32)

    def s_pallas(x):
        k = agp.SqExponentialKernel()
        return jnp.sum(
            pallas_gram.fused_isotropic_gram(k._apply_sqdist, x, x, True)
        )

    def s_ref(x):
        return jnp.sum(agp.kernelmatrix(agp.SqExponentialKernel(), x))

    np.testing.assert_allclose(
        np.asarray(jax.grad(s_pallas)(x)),
        np.asarray(jax.grad(s_ref)(x)),
        atol=1e-5,
    )


@pytest.mark.slow
def test_fused_gram_canonicalizes_1d_inputs_with_transforms(rng, monkeypatch):
    # regression: ARD/Linear/Function transforms assume (N, D) inputs; the
    # fused path must canonicalize 1-D x exactly as TransformedKernel._t
    import abstractgps_tpu as agp
    from abstractgps_tpu.kernels.base import ARDTransform, compose

    monkeypatch.setattr(pallas_chol, "_MIN_N", 8)
    monkeypatch.setattr(pallas_chol, "_BLOCK", 8)
    n = 23
    x = jnp.asarray(rng.uniform(size=(n,)), dtype=jnp.float32)  # 1-D!
    nd = jnp.full((n,), 0.1, jnp.float32)
    k = compose(agp.SEKernel(), ARDTransform(jnp.asarray([0.7], jnp.float32)))
    L = pallas_chol.cholesky_gram(k, x, nd)
    K = agp.kernelmatrix(k, x) + jnp.diag(nd)
    np.testing.assert_allclose(
        np.asarray(L), np.asarray(jax.lax.linalg.cholesky(K)), atol=2e-5
    )


@pytest.mark.parametrize("sym", [True, False])
def test_fused_gram_bwd_kernel_all_cotangents(rng, sym):
    # the fused Pallas BACKWARD sweep (r4): hyperparameter + x/z cotangents
    # against the XLA formulation, for parameterized kernels and an
    # arbitrary (non-symmetric) cotangent matrix
    import abstractgps_tpu as agp

    for k in [agp.RationalQuadraticKernel(alpha=1.7),
              agp.SqExponentialKernel(),
              agp.Matern32Kernel(),
              agp.GammaExponentialKernel(gamma=1.3)]:
        n, m, d = 40, 40 if sym else 28, 3
        x = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
        z = jnp.asarray(rng.uniform(size=(m, d)), jnp.float32)
        C = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)

        def fused(k_, x_, z_=None):
            zz = x_ if sym else z_
            return jnp.vdot(pallas_gram._fused(sym, k_, x_, zz), C)

        def xla(k_, x_, z_=None):
            return jnp.vdot(
                pallas_gram._xla_isotropic_gram(k_, x_, z_, sym), C)

        args = (k, x) if sym else (k, x, z)
        nums = (0, 1) if sym else (0, 1, 2)
        gf = jax.grad(fused, argnums=nums)(*args)
        gx = jax.grad(xla, argnums=nums)(*args)
        for a, b in zip(jax.tree_util.tree_leaves(gf),
                        jax.tree_util.tree_leaves(gx)):
            err = np.abs(np.asarray(a) - np.asarray(b)).max()
            scale = np.abs(np.asarray(b)).max() + 1e-6
            assert err < 2e-4 * scale + 1e-5, (type(k).__name__, sym, err)


def test_chol_solve_wide_matches_xla(rng):
    # single-trtri K^-1 B path: value + adjoints vs the XLA composition
    A = _spd(rng, 96)
    L = jax.lax.linalg.cholesky(A)
    B = jnp.asarray(rng.normal(size=(96, 40)), dtype=jnp.float32)
    X = pallas_chol.chol_solve_wide(L, B)
    X_ref = jax.lax.linalg.triangular_solve(
        L, jax.lax.linalg.triangular_solve(L, B, left_side=True, lower=True),
        left_side=True, lower=True, transpose_a=True)
    np.testing.assert_allclose(np.asarray(X), np.asarray(X_ref),
                               atol=5e-4, rtol=5e-4)
    w = jnp.asarray(rng.normal(size=(96, 40)), dtype=jnp.float32)

    def loss_wide(L_, B_):
        return jnp.vdot(pallas_chol.chol_solve_wide(L_, B_), w)

    def loss_ref(L_, B_):
        z = jax.lax.linalg.triangular_solve(L_, B_, left_side=True,
                                            lower=True)
        return jnp.vdot(jax.lax.linalg.triangular_solve(
            L_, z, left_side=True, lower=True, transpose_a=True), w)

    gW = jax.grad(loss_wide, argnums=(0, 1))(L, B)
    gR = jax.grad(loss_ref, argnums=(0, 1))(L, B)
    np.testing.assert_allclose(np.asarray(jnp.tril(gW[0])),
                               np.asarray(jnp.tril(gR[0])),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(gW[1]), np.asarray(gR[1]),
                               atol=1e-3, rtol=5e-3)
