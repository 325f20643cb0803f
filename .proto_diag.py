import time, numpy as np, jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MINI = 8

def _chol_block_body_v2(a_ref, l_ref):
    B = a_ref.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (B, 1), 0)
    M = a_ref[:]
    out_panels = []
    for jb in range(B // MINI):
        lo = jb * MINI
        P8 = M[:, lo:lo + MINI]                      # (B, 8) static slice
        cols = []
        for t in range(MINI):
            j = lo + t
            piv = P8[j, t]
            inv = lax.rsqrt(piv)
            c = jnp.where(rows >= j, P8[:, t:t + 1] * inv, 0.0)  # (B,1)
            crow = c[lo:lo + MINI, 0][None, :]        # (1, 8) static
            P8 = P8 - c * crow
            cols.append(c)
        P = jnp.concatenate(cols, axis=1)             # (B, 8)
        out_panels.append(P)
        if lo + MINI < B:
            Prow = P[lo + MINI:, :]                   # (rest, 8)
            M = jnp.concatenate([
                M[:, :lo + MINI],
                M[:, lo + MINI:] - jax.lax.dot_general(
                    P, Prow, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST),
            ], axis=1)
    l_ref[:] = jnp.concatenate(out_panels, axis=1)

def chol_block_v2(A):
    return pl.pallas_call(
        _chol_block_body_v2,
        out_shape=jax.ShapeDtypeStruct(A.shape, A.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(A)

rng = np.random.default_rng(0)
for B in (256, 512):
    X = rng.normal(size=(B, B+8)).astype(np.float32)
    A = jnp.asarray(X @ X.T / (B+8) + 0.5*np.eye(B, dtype=np.float32))
    L = chol_block_v2(A)
    err = float(jnp.max(jnp.abs(L - jax.lax.linalg.cholesky(A))))
    @jax.jit
    def run(A):
        def body(c, _):
            L = chol_block_v2(A + c*jnp.float32(1e-12))
            return c + L[0,0], None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=32)
        return out
    t0=time.perf_counter(); float(run(A)); comp=time.perf_counter()-t0
    t0=time.perf_counter(); float(run(A)); dt=(time.perf_counter()-t0)/32
    print(f"v2 diag B={B}: {dt*1e6:.0f}us/block maxerr={err:.2e} (compile {comp:.1f}s)")
