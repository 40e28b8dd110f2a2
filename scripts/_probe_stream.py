import time, jax, jax.numpy as jnp
x = jnp.ones((32, 1024, 1024), jnp.float32)
reps = 256
@jax.jit
def stream(x):
    def body(i, acc):
        return acc + x * (1.0 + i.astype(jnp.float32) * 1e-9)
    return jax.lax.fori_loop(0, reps, body, jnp.zeros_like(x))[0, 0]
t0 = time.perf_counter()
jax.device_get(stream(x))
print('compile+first', time.perf_counter() - t0, flush=True)
for _ in range(3):
    t0 = time.perf_counter(); jax.device_get(stream(x)); dt = time.perf_counter() - t0
    print(f'dt={dt*1000:.1f}ms gbps={3*x.nbytes*reps/dt/1e9:.1f}', flush=True)
