"""Driver benchmark: the BASELINE.md metric pair on one chip.

Prints ONE JSON line with the driver contract fields
(``metric``/``value``/``unit``/``vs_baseline`` — log-marginal-likelihood
evals/s at N=8192, Cholesky-bound) plus the round-3 additions folded into
the same object:

- ``grad_evals_per_s``  — ∇θ logpdf evals/s (the §3.5 hot loop: every
  leapfrog/optimizer step re-enters logpdf under AD);
- ``nuts_samples_per_s_chip`` — the second driver metric: latent-Poisson
  NUTS (BASELINE config 4 shape: u ~ f(X) + Poisson counts, 64 vmapped
  chains), total kept draws per second on one chip;
- ``tflops`` / ``pct_f32_roof`` — achieved FLOP/s of the forward eval
  against the 49 TFLOP/s f32-exact v5e roof (utils/profiling.py).

Ours: the whole eval loop runs inside ONE jitted ``lax.scan`` — the
TPU-native pattern (under MCMC/VI the logpdf re-enters *inside* the
compiled sampler), so per-dispatch host↔device overhead is amortised away.

Baseline (the reference publishes no numbers; BASELINE.json "published" is
{}): a straight port of the reference's §3.1 stack (pairwise gram via the
same BLAS expansion KernelFunctions uses, XLA Cholesky, triangular solve)
*used the way the reference is used* — one host dispatch per logpdf eval,
as Julia calls LAPACK per call. Same device, same math; the ratio measures
the framework design (fusion + loop-in-compiled-program), not
cherry-picked kernels.
"""

import json
import time

import numpy as np

N, D = 8192, 8
K_EVALS = 192       # scan length for our batched paths (amortizes the
                    # ~20 ms tunnel dispatch to <2%: real MCMC/MLE loops
                    # run thousands of in-program evals). Round 5: 48 was
                    # not variance-proof — the same binary measured 106.9
                    # (driver, r4) vs 122.8 evals/s (min-of-5) at K=48;
                    # K=192 + min-of-5 + the K/2 difference estimator
                    # below pin the number to the device rate.
K_HALF = 96         # second scan length for the paired-difference
                    # device-rate estimate: (t(K) - t(K/2)) / (K - K/2)
                    # cancels per-dispatch overhead exactly
K_GRAD = 24         # grad evals per dispatch (~0.6 s at ~40/s)
K_DISPATCH = 8      # host dispatches for the baseline path


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    import abstractgps_tpu as agp
    from abstractgps_tpu.utils.profiling import (
        TPU_V5E_PEAK_F32,
        cholesky_flops,
        gram_flops,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(N, D)), dtype=jnp.float32)
    y = jnp.asarray(rng.normal(size=(N,)), dtype=jnp.float32)
    thetas = jnp.asarray(
        np.stack([rng.uniform(0.7, 1.3, size=K_EVALS),
                  rng.uniform(0.8, 1.2, size=K_EVALS)], axis=1),
        dtype=jnp.float32,
    )

    def ours(theta, x, y):
        sigma2, ell = theta[0], theta[1]
        kernel = sigma2 * agp.with_lengthscale(agp.Matern32Kernel(), ell)
        return agp.GP(kernel)(x, 0.1).logpdf(y)

    @jax.jit
    def ours_batched(x, y, thetas):
        def body(carry, theta):
            return carry + ours(theta, x, y), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), thetas)
        return total

    @jax.jit
    def ours_batched_half(x, y, thetas):
        def body(carry, theta):
            return carry + ours(theta, x, y), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), thetas[:K_HALF])
        return total

    @jax.jit
    def grads_batched(x, y, thetas):
        def body(carry, theta):
            g = jax.grad(ours)(theta, x, y)
            return carry + g[0] + g[1], None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), thetas[:K_GRAD])
        return total

    @jax.jit
    def naive_once(theta, x, y):
        sigma2, ell = theta[0], theta[1]
        xs = x / ell
        sq = jnp.sum(xs * xs, axis=1)
        d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * (xs @ xs.T), 0.0)
        t = jnp.sqrt(3.0) * jnp.sqrt(jnp.maximum(d2, 1e-36))
        K = sigma2 * (1.0 + t) * jnp.exp(-t) + 0.1 * jnp.eye(N)
        L = jax.lax.linalg.cholesky(K)
        z = jax.lax.linalg.triangular_solve(
            L, y[:, None], left_side=True, lower=True
        )[:, 0]
        return -0.5 * (
            z @ z
            + 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
            + N * jnp.log(2.0 * jnp.pi)
        )

    # ---- ours: K_EVALS logpdfs per dispatch --------------------------------
    warm = float(ours_batched(x, y, thetas))  # compile + warmup
    assert np.isfinite(warm), f"non-finite logpdf sum from production path: {warm}"
    t_full = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(ours_batched(x, y, thetas))
        t_full = min(t_full, time.perf_counter() - t0)
    t_ours = t_full / K_EVALS

    # paired-difference device-rate estimate: the K/2-length program pays
    # the same per-dispatch overhead, so t(K) - t(K/2) is pure device time
    # for K - K/2 evals
    float(ours_batched_half(x, y, thetas))
    t_half = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(ours_batched_half(x, y, thetas))
        t_half = min(t_half, time.perf_counter() - t0)
    t_dev = (t_full - t_half) / (K_EVALS - K_HALF)

    # ---- grad of logpdf (the MCMC/MLE hot loop) ----------------------------
    warm_g = float(grads_batched(x, y, thetas))
    assert np.isfinite(warm_g), f"non-finite grad sum: {warm_g}"
    t_grad = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        float(grads_batched(x, y, thetas))
        t_grad = min(t_grad, (time.perf_counter() - t0) / K_GRAD)

    # ---- baseline: one dispatch per logpdf (reference usage pattern) -------
    float(naive_once(thetas[0], x, y))  # compile + warmup
    t_naive = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(K_DISPATCH):
            float(naive_once(thetas[i], x, y))
        t_naive = min(t_naive, (time.perf_counter() - t0) / K_DISPATCH)

    # ---- NUTS samples/s/chip: latent-Poisson, 64 vmapped chains ------------
    from abstractgps_tpu.inference.mcmc import init_chain_positions, run_mcmc

    n_lat, n_chains, n_draws, n_warm = 256, 64, 64, 64
    xl_h = rng.uniform(size=(n_lat, 1))
    # host-side f64 data generation (the f32 chol of a near-singular gram
    # is exactly the failure mode the library handles by NaN-rejection —
    # not what we want in the data generator)
    from scipy.spatial.distance import cdist

    d_h = cdist(xl_h, xl_h)
    t_h = np.sqrt(3.0) * d_h
    Kl_h = (1.0 + t_h) * np.exp(-t_h) + 1e-8 * np.eye(n_lat)
    Ll_h = np.linalg.cholesky(Kl_h)
    u_h = 2.0 + Ll_h @ rng.normal(size=n_lat)
    y_lat = jnp.asarray(rng.poisson(np.exp(np.clip(u_h, -10, 8))),
                        dtype=jnp.float32)
    Ll = jnp.asarray(Ll_h, dtype=jnp.float32)

    def logjoint(v):
        u = 2.0 + Ll @ v
        return (-0.5 * jnp.sum(v * v)
                + jnp.sum(y_lat * u - jnp.exp(u) - jax.lax.lgamma(y_lat + 1.0)))

    init = init_chain_positions(
        jax.random.PRNGKey(0), jnp.zeros((n_lat,), jnp.float32),
        num_chains=n_chains, jitter=0.1,
    )

    # time the COMPILED program (the _program_only hook): run_mcmc builds a
    # fresh jit closure per call, so naively re-calling it re-traces the
    # whole sampler — an 18x measurement artifact at the N=2048 hyper
    # config (1.3 "samples/s" vs 24.7 real). Real users call run_mcmc once
    # and the retrace amortizes over the actual (much longer) run; the
    # sustained rate is the compiled program's.
    run_p, args_p = run_mcmc(logjoint, init, jax.random.PRNGKey(1),
                             num_chains=n_chains, num_samples=n_draws,
                             num_warmup=n_warm, max_depth=8,
                             _program_only=True)
    out = run_p(*args_p)
    jax.block_until_ready(out)   # compile + warmup
    assert np.isfinite(np.asarray(out[0][1])).all()  # chain logdensities
    t_nuts = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(run_p(*args_p))
        t_nuts = min(t_nuts, time.perf_counter() - t0)
    nuts_rate = n_chains * n_draws / t_nuts

    # sustained SEGMENTED rate at the same config: segment_size bounds each
    # device execution (the preemptible-pod / tunneled-chip mode). The gap
    # vs the one-program rate is the per-segment host round-trip cost —
    # reported so the 3 NUTS numbers in this artifact explain each other.
    seg_cache = {}  # reuse compiled segment programs across timed calls
                    # (same retrace artifact as the fused path otherwise)

    def run_nuts_seg():
        return run_mcmc(logjoint, init, jax.random.PRNGKey(1),
                        num_chains=n_chains, num_samples=n_draws,
                        num_warmup=n_warm, max_depth=8, segment_size=16,
                        program_cache=seg_cache)

    res_s = run_nuts_seg()
    jax.block_until_ready(res_s.positions)
    t_seg = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        res_s = run_nuts_seg()
        jax.block_until_ready(res_s.positions)
        t_seg = min(t_seg, time.perf_counter() - t0)
    nuts_rate_seg = n_chains * n_draws / t_seg

    # chip CAPACITY: same model at 1024 chains — the 64-chain config is
    # VPU-issue-overhead-bound (each op touches only (64, dim) elements);
    # wider batches fill the vector unit (measured ~8x at 16x chains)
    nc_big = 1024
    init_big = init_chain_positions(
        jax.random.PRNGKey(2), jnp.zeros((n_lat,), jnp.float32),
        num_chains=nc_big, jitter=0.1,
    )

    run_b, args_b = run_mcmc(logjoint, init_big, jax.random.PRNGKey(3),
                             num_chains=nc_big, num_samples=n_draws,
                             num_warmup=n_warm, max_depth=8,
                             _program_only=True)
    jax.block_until_ready(run_b(*args_b))
    t_big = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(run_b(*args_b))
        t_big = min(t_big, time.perf_counter() - t0)
    nuts_rate_big = nc_big * n_draws / t_big

    # ---- hyperparameter-NUTS at N=2048: the Cholesky-bound NUTS workload -
    # (BASELINE's "logpdf under MCMC" meaning: every leapfrog re-enters
    # gram->chol->logpdf under AD at full N)
    n_h = 2048
    x_h = jnp.asarray(rng.uniform(size=(n_h, D)), jnp.float32)
    y_h = jnp.asarray(rng.normal(size=(n_h,)), jnp.float32)

    def hyper_logdens(q):
        s2, ell, nv = jnp.exp(q[0]), jnp.exp(q[1]), jnp.exp(q[2])
        k = s2 * agp.with_lengthscale(agp.Matern32Kernel(), ell)
        lp = agp.GP(k)(x_h, nv).logpdf(y_h)
        return lp - 0.5 * jnp.sum(q * q)  # weak N(0,1) prior on log params

    # chains=2 IS the measured-best throughput config (round-5 sweep on the
    # chip: 2→25.0, 4→21.0, 8→15.1, 16→11.8 samples/s/chip): each chain's
    # leapfrog is a FULL N=2048 gram+chol — already MXU-saturating, so
    # extra vmapped chains add linear compute plus tree-depth lockstep
    # waste (the batched while_loop runs every chain to the slowest
    # trajectory). See docs/performance.md "hyper-NUTS chain scaling".
    nh_chains, nh_draws, nh_warm = 2, 8, 8
    init_h = init_chain_positions(
        jax.random.PRNGKey(4), jnp.zeros((3,), jnp.float32),
        num_chains=nh_chains, jitter=0.05,
    )

    run_h, args_h = run_mcmc(hyper_logdens, init_h, jax.random.PRNGKey(5),
                             num_chains=nh_chains, num_samples=nh_draws,
                             num_warmup=nh_warm, max_depth=5,
                             _program_only=True)
    out_h = run_h(*args_h)
    jax.block_until_ready(out_h)
    assert np.isfinite(np.asarray(out_h[0][1])).all()
    t_h = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run_h(*args_h))
        t_h = min(t_h, time.perf_counter() - t0)
    hyper_rate = nh_chains * nh_draws / t_h

    # ---- posterior prediction: mean_and_var at N=8192, M=4096 ------------
    M = 4096
    xs_p = jnp.asarray(rng.uniform(size=(M, D)), dtype=jnp.float32)

    def pred_once(theta, x, y, xs):
        sigma2, ell = theta[0], theta[1]
        kernel = sigma2 * agp.with_lengthscale(agp.Matern32Kernel(), ell)
        post = agp.posterior(agp.GP(kernel)(x, 0.1), y)
        mu, var = post.mean_and_var(xs)
        return jnp.sum(mu) + jnp.sum(var)

    @jax.jit
    def pred_batched(x, y, xs, thetas):
        def body(c, t):
            return c + pred_once(t, x, y, xs), None

        tot, _ = jax.lax.scan(body, jnp.float32(0.0), thetas[:12])
        return tot

    warm_p = float(pred_batched(x, y, xs_p, thetas))
    assert np.isfinite(warm_p), warm_p
    t_pred = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        float(pred_batched(x, y, xs_p, thetas))
        t_pred = min(t_pred, (time.perf_counter() - t0) / 12)

    # ---- Markov (state-space) backend: the O(N) exact tier on the chip ----
    # Sequential Kalman scan vs the parallel-in-time associative filter
    # (Särkkä & García-Fernández 2020) at N=10^6, 1-D Matern-3/2. Data is
    # passed as jit ARGUMENTS: closing over device arrays embeds them as
    # MLIR constants, which pulls them host-side at lowering — pathological
    # through the tunneled chip (~40 s per 100k-array) and wasteful anywhere.
    from abstractgps_tpu.models.markov import markov_logpdf

    n_mk = 1_000_000
    t_mk = jnp.asarray(np.sort(rng.uniform(0, 1000, size=n_mk)),
                       jnp.float32)[:, None]
    y_mk = jnp.asarray(rng.normal(size=n_mk), jnp.float32)

    def mk_rate(parallel):
        @jax.jit
        def f(t_, y_):
            kernel = 1.0 * agp.with_lengthscale(agp.Matern32Kernel(), 0.5)
            fx = agp.GP(kernel)(t_, 0.1)
            return markov_logpdf(fx, y_, parallel=parallel)

        v = float(f(t_mk, y_mk))
        assert np.isfinite(v), f"non-finite markov logpdf (parallel={parallel})"
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(t_mk, y_mk))
            best = min(best, time.perf_counter() - t0)
        return 1.0 / best

    markov_seq_rate = mk_rate(False)
    markov_par_rate = mk_rate(True)

    flops_fwd = cholesky_flops(N) + gram_flops(N, N, D)
    print(
        json.dumps(
            {
                "metric": f"logpdf evals/s, N={N} D={D} f32 ({jax.default_backend()})",
                "value": round(1.0 / t_ours, 3),
                "unit": "evals/s",
                "vs_baseline": round(t_naive / t_ours, 3),
                "fwd_evals_per_s_device": round(1.0 / t_dev, 3),
                "grad_evals_per_s": round(1.0 / t_grad, 3),
                "pred_evals_per_s": round(1.0 / t_pred, 3),
                "pred_config": f"posterior mean_and_var N={N} M={M}",
                "nuts_samples_per_s_chip": round(nuts_rate, 1),
                "nuts_samples_per_s_chip_segmented": round(nuts_rate_seg, 1),
                "nuts_samples_per_s_chip_1024c": round(nuts_rate_big, 1),
                "nuts_config": f"latent-poisson n={n_lat} chains={n_chains} depth<=8",
                "hyper_nuts_samples_per_s_chip": round(hyper_rate, 2),
                "hyper_nuts_config": (
                    f"hyperparameter NUTS N={n_h} chains={nh_chains} depth<=5 "
                    "(Cholesky-bound: one gram+chol+logpdf grad per leapfrog)"
                ),
                "markov_logpdf_evals_per_s_seq": round(markov_seq_rate, 2),
                "markov_logpdf_evals_per_s_par": round(markov_par_rate, 2),
                "markov_config": f"N={n_mk} 1-D Matern32 f32 (O(N) state-space)",
                "tflops": round(flops_fwd / t_ours / 1e12, 2),
                "pct_f32_roof": round(100 * flops_fwd / t_ours / TPU_V5E_PEAK_F32, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
