import time
import numpy as np
import jax, jax.numpy as jnp
from barcoder_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()

for mb in (0.6, 2.4, 2.4, 2.4, 4.8):
    n = int(mb * 1e6)
    a = np.random.randint(0, 255, n, dtype=np.uint8)
    t0 = time.time()
    d = jnp.asarray(a)
    np.asarray(d[:8])
    dt = time.time() - t0
    print(f"h2d {mb:.1f} MB: {dt*1e3:.0f} ms -> {n/dt/1e6:.0f} MB/s")
