"""Chip peak via CHAINED matmuls: a <- a @ b inside fori_loop (values
blow up; timing only). No big intermediate beyond a itself."""
import time
import numpy as np
import jax, jax.numpy as jnp

for M, Kc in [(4096, 4096), (8192, 8192)]:
    REPS = 50
    a0 = jnp.asarray(np.random.randn(M, Kc) * 0.01, jnp.bfloat16)
    b = jnp.asarray(np.random.randn(Kc, Kc) * 0.01, jnp.bfloat16)
    @jax.jit
    def loop(a, b):
        def body(i, a):
            return jnp.dot(a, b, preferred_element_type=jnp.bfloat16)
        return jax.lax.fori_loop(0, REPS, body, a)[:8, :8]
    r = np.asarray(loop(a0, b))
    t0 = time.time()
    r = np.asarray(loop(a0, b))
    per = (time.time() - t0) / REPS
    fl = 2 * M * Kc * Kc
    print(f"{M}x{Kc}x{Kc} chained: {per*1e3:.3f} ms -> {fl/per/1e12:.1f} TFLOP/s")
