"""Cost model for the seed-join engine: device sort, searchsorted, ragged
expansion, gather-verify at E.coli-design sizes."""
import time
import numpy as np
import jax, jax.numpy as jnp

N = 4_718_592      # genome positions (bucketed)
S = 1_179_648      # spacer half-keys (573k x 2 strands)
CAP = 16_777_216   # pair expansion cap

rng = np.random.default_rng(0)
site_keys = jnp.asarray(rng.integers(0, 1 << 20, N, dtype=np.int64).astype(np.int32))
pos = jnp.arange(N, dtype=jnp.int32)
sp_keys = jnp.asarray(rng.integers(0, 1 << 20, S, dtype=np.int64).astype(np.int32))

def timeit(name, fn, *args):
    r = jax.tree.map(np.asarray, fn(*args))
    t0 = time.time()
    r = jax.tree.map(np.asarray, fn(*args))
    print(f"{name}: {(time.time()-t0)*1e3:.0f} ms")
    return r

@jax.jit
def sort_sites(k, p):
    ks, ps = jax.lax.sort((k, p), num_keys=1)
    return ks, ps

ks, ps = timeit("sort 4.7M (key,pos)", sort_sites, site_keys, pos)
ks_d, ps_d = jnp.asarray(ks), jnp.asarray(ps)

@jax.jit
def join_ranges(ks, q):
    lo = jnp.searchsorted(ks, q)
    hi = jnp.searchsorted(ks, q + 1)
    return lo, hi

lo, hi = timeit("searchsorted 1.15M x2", join_ranges, ks_d, sp_keys)

@jax.jit
def expand(lo, hi, ps):
    cnt = hi - lo
    cum = jnp.cumsum(cnt)
    total = cum[-1]
    t = jnp.arange(CAP, dtype=jnp.int32)
    sp = jnp.searchsorted(cum, t, side="right")  # which spacer
    sp_safe = jnp.clip(sp, 0, lo.shape[0] - 1)
    base = cum[sp_safe] - cnt[sp_safe]
    site_sorted = lo[sp_safe] + (t - base)
    valid = t < total
    p = ps[jnp.clip(site_sorted, 0, ps.shape[0] - 1)]
    return jnp.where(valid, p, -1), sp_safe, total

p_pair, sp_pair, total = timeit("ragged expand to 16.8M pairs", expand, jnp.asarray(lo), jnp.asarray(hi), ps_d)
print("total pairs:", int(total))

scan = jnp.asarray(rng.integers(0, 4, N + 64).astype(np.int8))
qcodes = jnp.asarray(rng.integers(0, 4, (S, 20)).astype(np.int8))

@jax.jit
def verify(p_pair, sp_pair, scan, qcodes):
    mm = jnp.zeros(CAP, jnp.int32)
    safe_p = jnp.clip(p_pair, 0, N - 1)
    for j in range(20):
        g = scan[safe_p + j]
        q = qcodes[sp_pair, j]
        mm = mm + (g != q).astype(jnp.int32)
    return (mm <= 1) & (p_pair >= 0)

hits = timeit("verify 16.8M pairs (20 gathers)", verify, jnp.asarray(p_pair), jnp.asarray(sp_pair), scan, qcodes)
print("hits:", int(hits.sum()))
