import time, numpy as np, jax, jax.numpy as jnp
d = jax.devices()[0]
print("device:", d.device_kind, d.platform)
rng = np.random.default_rng(0)
# HBM bandwidth: big copy
x = jnp.asarray(rng.normal(size=(8192, 8192)).astype(np.float32))
@jax.jit
def cp(x):
    def body(c, _):
        y = x * (1.0 + c*1e-12)
        return c + y[0,0], None
    out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=8)
    return out
float(cp(x))
t0=time.perf_counter(); float(cp(x)); dt=(time.perf_counter()-t0)/8
print(f"elementwise 256MB read+write: {dt*1e3:.2f}ms -> {2*x.nbytes/dt/1e9:.0f} GB/s")
# big square GEMM f32
a = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
for prec in ("default","float32","highest"):
    @jax.jit
    def mm(a):
        def body(c, _):
            g = jnp.matmul(a + c*jnp.float32(1e-12), a, precision=prec)
            return c + g[0,0], None
        out,_ = jax.lax.scan(body, jnp.float32(0.0), None, length=8)
        return out
    float(mm(a))
    t0=time.perf_counter(); float(mm(a)); dt=(time.perf_counter()-t0)/8
    print(f"gemm 4096^3 prec={prec}: {dt*1e3:.2f}ms ({2*4096**3/dt/1e12:.0f} TFLOP/s)")
# bf16 gemm
ab = a.astype(jnp.bfloat16)
@jax.jit
def mmb(a):
    def body(c, _):
        g = jnp.matmul(a + c*jnp.bfloat16(0), a, preferred_element_type=jnp.bfloat16)
        return c + g[0,0].astype(jnp.float32), None
    out,_ = jax.lax.scan(body, jnp.float32(0.0), None, length=8)
    return out
float(mmb(ab))
t0=time.perf_counter(); float(mmb(ab)); dt=(time.perf_counter()-t0)/8
print(f"gemm 4096^3 bf16: {dt*1e3:.2f}ms ({2*4096**3/dt/1e12:.0f} TFLOP/s)")
