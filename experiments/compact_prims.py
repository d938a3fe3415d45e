"""Compare level-2 compaction primitives on-device: sized nonzero (sort)
vs per-row top_k over (cap_rows, P2)."""
import time, functools
import numpy as np
import jax, jax.numpy as jnp

CR, P2, CAP, K = 131072, 512, 262144, 4
rng = np.random.default_rng(0)
hit_np = rng.random((CR, P2)) < (1.0 / 512)
hit = jnp.asarray(hit_np)

@jax.jit
def via_nonzero(h):
    flat = h.reshape(-1)
    (k,) = jnp.nonzero(flat, size=CAP, fill_value=-1)
    return k

@jax.jit
def via_topk(h):
    keyed = jnp.where(h, jax.lax.iota(jnp.int32, P2)[None, :] + 1, 0)
    topv = jax.lax.top_k(keyed, K)[0]          # (CR, K)
    flat2 = (topv > 0).reshape(-1)
    (s,) = jnp.nonzero(flat2, size=CAP, fill_value=-1)
    return s

def timeit(name, fn):
    r = np.asarray(fn(hit))
    REPS = 5
    @jax.jit
    def loop(h):
        def body(i, carry):
            hh = h.at[0, 0].set(carry[0] >= 0)
            return fn(hh)
        return jax.lax.fori_loop(0, REPS, body, fn(h))
    r = np.asarray(loop(hit))
    t0 = time.time()
    r = np.asarray(loop(hit))
    per = (time.time() - t0) / (REPS + 1)
    print(f"{name}: {per*1e3:.1f} ms")

timeit("nonzero 67M", via_nonzero)
timeit("topk k=4 + nonzero 524k", via_topk)
