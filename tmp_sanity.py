import time
import jax, jax.numpy as jnp

x = jax.random.normal(jax.random.PRNGKey(0), (8192, 8192), jnp.bfloat16)

@jax.jit
def mm(a):
    return a @ a

out = mm(x); _ = float(jnp.sum(out))
t0 = time.time()
for _ in range(10):
    out = mm(out)
_ = float(jnp.sum(out))
dt = (time.time() - t0) / 10
print(f"8k matmul: {dt*1e3:.2f} ms -> {2*8192**3/dt/1e12:.1f} TFLOP/s")
