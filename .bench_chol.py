import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from abstractgps_tpu.ops import pallas_chol

rng = np.random.default_rng(0)
K = 8
for N in (4096, 8192):
    X = rng.normal(size=(N, N+8)).astype(np.float32)
    A = jnp.asarray(X @ X.T / (N+8) + 0.5*np.eye(N, dtype=np.float32))

    def loop(f):
        @jax.jit
        def run(A):
            def body(c, _):
                L = f(A + c * jnp.float32(1e-12))
                return c + jnp.sum(jnp.diagonal(L)[:1]), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return out
        return run

    for name, f in [("lax", jax.lax.linalg.cholesky), ("pallas", pallas_chol.pallas_cholesky)]:
        run = loop(f)
        float(run(A))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); float(run(A))
            best = min(best, (time.perf_counter()-t0)/K)
        print(f"N={N} {name}: {best*1e3:.2f}ms/chol  ({(N**3/3)/best/1e12:.1f} TFLOP/s)")
