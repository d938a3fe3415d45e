"""True chip peak: plain XLA bf16 matmul looped inside one jit with a data
dependency, one small fetch."""
import time
import numpy as np
import jax, jax.numpy as jnp

for M, Kc, N in [(4096, 4096, 4096), (8192, 8192, 8192), (512, 128, 16384)]:
    REPS = 20 if M < 8192 else 8
    a0 = jnp.asarray(np.random.randn(M, Kc), jnp.bfloat16)
    b = jnp.asarray(np.random.randn(Kc, N), jnp.bfloat16)
    @jax.jit
    def loop(a, b):
        def body(i, a):
            c = jnp.dot(a, b, preferred_element_type=jnp.float32)
            # fold a scalar of c back into a: full dependency, tiny cost
            return (a + c[0, 0].astype(jnp.bfloat16) * 0).astype(jnp.bfloat16)
        a = jax.lax.fori_loop(0, REPS, body, a)
        return jnp.dot(a, b, preferred_element_type=jnp.float32)[:8, :8]
    r = np.asarray(loop(a0, b))
    t0 = time.time()
    r = np.asarray(loop(a0, b))
    per = (time.time() - t0) / (REPS + 1)
    fl = 2 * M * Kc * N
    print(f"{M}x{Kc}x{N}: {per*1e3:.2f} ms -> {fl/per/1e12:.1f} TFLOP/s")
