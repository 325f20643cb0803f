import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from abstractgps_tpu.ops import pallas_chol

rng = np.random.default_rng(0)

# 1. diagonal-block kernel cost alone (scan of 32 calls)
for B in (128, 256, 512):
    X = rng.normal(size=(B, B+8)).astype(np.float32)
    A = jnp.asarray(X @ X.T / (B+8) + 0.5*np.eye(B, dtype=np.float32))
    @jax.jit
    def run(A):
        def body(c, _):
            L = pallas_chol._chol_block(A + c*jnp.float32(1e-12))
            return c + L[0,0], None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=32)
        return out
    float(run(A))
    t0 = time.perf_counter(); float(run(A)); dt = (time.perf_counter()-t0)/32
    print(f"diag block B={B}: {dt*1e6:.0f}us/block")

# 2. GEMM precision sweep: trailing-update-shaped matmul (8192x256)@(256x8192)
M = 8192
a = jnp.asarray(rng.normal(size=(M, 256)).astype(np.float32))
for prec in ("default", "float32", "highest"):
    @jax.jit
    def run(a):
        def body(c, _):
            g = jnp.matmul(a + c*jnp.float32(1e-12), a.T, precision=prec)
            return c + g[0,0], None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=8)
        return out
    float(run(a))
    t0 = time.perf_counter(); float(run(a)); dt = (time.perf_counter()-t0)/8
    print(f"syrk 8192x256 prec={prec}: {dt*1e3:.2f}ms ({2*M*M*256/dt/1e12:.0f} TFLOP/s)")
