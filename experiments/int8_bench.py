"""Microbench: int8 vs bf16 MXU matmul in Pallas, timed by looping the
kernel inside ONE jit (lax.fori_loop with a data dependency) and making a
single small fetch — the only reliable timing on the tunneled dev chip."""
import functools, time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BS_M, K, P = 512, 128, 16384
N_TILES, N_SB = 16, 40
REPS = 10

def kern(q_ref, g_ref, out_ref, *, out_dtype):
    s = pl.program_id(1)
    scores = jnp.dot(q_ref[:], g_ref[0], preferred_element_type=out_dtype)
    colmax = jnp.max(scores, axis=0, keepdims=True)  # (1, P)
    @pl.when(s % 8 == 0)
    def _z():
        out_ref[:] = jnp.zeros_like(out_ref)
    out_ref[0, pl.ds(s % 8, 1), :] = colmax[0:1, :128].astype(out_ref.dtype)

def run(dtype_name):
    if dtype_name == "bf16":
        in_dt, out_dt = jnp.bfloat16, jnp.float32
    else:
        in_dt, out_dt = jnp.int8, jnp.int32
    q0 = jnp.asarray(np.random.randint(0, 2, (N_SB * BS_M, K)), dtype=in_dt)
    g = jnp.asarray(np.random.randint(0, 2, (N_TILES, K, P)), dtype=in_dt)
    f = pl.pallas_call(
        functools.partial(kern, out_dtype=out_dt),
        grid=(N_TILES, N_SB),
        in_specs=[
            pl.BlockSpec((BS_M, K), lambda t, s: (s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, P), lambda t, s: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda t, s: (t, s // 8, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_TILES, (N_SB + 7) // 8 * 8, 128), out_dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )
    @jax.jit
    def loop(q):
        def body(i, carry):
            qq = q.at[0, 0].set(carry[0, 0, 0].astype(in_dt))
            out = f(qq, g)
            return out
        return jax.lax.fori_loop(0, REPS, body, f(q, g))
    r = np.asarray(loop(q0))  # warm (includes compile)
    t0 = time.time()
    r = np.asarray(loop(q0))
    dt = time.time() - t0
    per = dt / (REPS + 1)
    flops = 2 * N_TILES * N_SB * BS_M * K * P
    print(f"{dtype_name}: {per*1e3:.2f} ms/iter -> {flops/per/1e12:.1f} T/s (chk {int(r[0,0,0])})")

for name in sys.argv[1:] or ["bf16", "int8"]:
    run(name)
