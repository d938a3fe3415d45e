"""Phase-1 kernel rate vs (BS_M, P) at E.coli shapes."""
import time
import numpy as np
import jax, jax.numpy as jnp
from barcoder_tpu.ops import pallas_scan as ps

L, K = 20, 128
N_STARTS = 288 * 16384
S_PAD2 = 20480
rng = np.random.default_rng(0)
q_codes = rng.integers(0, 4, (S_PAD2, L)).astype(np.int8)
q_oh = np.zeros((S_PAD2, K), np.float32)
for j in range(L):
    q_oh[np.arange(S_PAD2), 4 * j + q_codes[:, j]] = 1.0
q_oh[:, 4 * L] = 1.0
q_dev = jnp.asarray(q_oh, jnp.bfloat16)
th0 = jnp.full((1,), float(L - 3), jnp.float32)

def run(P, BS_M, SUB):
    n_tiles = N_STARTS // P
    tiles = jnp.asarray(rng.integers(0, 4, (n_tiles, 1, P + K // 4)).astype(np.int32))
    bias = jnp.zeros((n_tiles, 2, P), jnp.float32)
    REPS = 4
    def fn(th, q, t, b):
        return ps.scan_block_hits(th, q, t, b, L=L, K=K, P=P, SUB=SUB,
                                  BS_M=BS_M, fold_bias=True)
    @jax.jit
    def loop(th, q, t, b):
        def body(i, carry):
            tt = th + 0.0 * carry[0, 0, 0]
            return fn(tt, q, t, b)
        return jax.lax.fori_loop(0, REPS, body, fn(th, q, t, b))
    try:
        r = np.asarray(loop(th0, q_dev, tiles, bias))
        t0 = time.time()
        r = np.asarray(loop(th0, q_dev, tiles, bias))
        per = (time.time() - t0) / (REPS + 1)
        pairs = n_tiles * (S_PAD2 // BS_M) * BS_M * P
        print(f"P={P} BS_M={BS_M} SUB={SUB}: {per*1e3:.1f} ms -> "
              f"{pairs/per/1e12:.2f}e12 pairs/s ({2*128*pairs/per/1e12:.0f} TF)")
    except Exception as e:
        print(f"P={P} BS_M={BS_M} SUB={SUB}: FAILED {type(e).__name__} {str(e)[:120]}")

run(16384, 512, 32)    # current config
run(16384, 1024, 32)
run(32768, 512, 64)
run(8192, 512, 16)
run(16384, 2048, 32)
