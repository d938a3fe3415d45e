"""Valid ablations of the phase-1 kernel: every variant consumes the full
score matrix via the hit+seg epilogue, so nothing is DCE'd.

  A. build G in kernel, per-step seg matmul   (the current real kernel)
  B. stream prebuilt G from HBM, per-step seg (isolates G-build cost)
  C. build G in kernel, 8-step batched seg    (isolates seg-matmul cost)
  D. stream G, batched seg                    (both fixes)
"""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, K, P, SUB, BS_M = 20, 128, 16384, 32, 512
N_TILES, N_SB = 320, 40
REPS = 5

rng = np.random.default_rng(0)
q_codes = rng.integers(0, 4, (N_SB * BS_M, L)).astype(np.int8)
q_oh = np.zeros((N_SB * BS_M, K), np.float32)
for j in range(L):
    q_oh[np.arange(N_SB * BS_M), 4 * j + q_codes[:, j]] = 1.0
q_oh[:, 4 * L] = 1.0
q_dev = jnp.asarray(q_oh, jnp.bfloat16)
tiles = jnp.asarray(rng.integers(0, 4, (N_TILES, 1, P + K // 4)).astype(np.int32))
bias = jnp.zeros((N_TILES, 2, P), jnp.float32)
th0 = jnp.full((1,), float(L - 3), jnp.float32)

# prebuilt G for streaming variants (built once on device, XLA)
def build_g_all(tiles, bias):
    flat = tiles[:, 0, :]
    windows = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(flat, j, P, axis=-1) for j in range(L)], axis=-2
    )  # (T, L, P)
    onehot = windows[:, :, None, :] == jnp.arange(4, dtype=jnp.int32)[None, None, :, None]
    g = onehot.astype(jnp.bfloat16).reshape(N_TILES, 4 * L, P)
    pad = jnp.zeros((N_TILES, K - 4 * L, P), jnp.bfloat16)
    g = jnp.concatenate([g, pad], axis=1)
    g = g.at[:, 4 * L : 4 * L + 2, :].set(bias.astype(jnp.bfloat16))
    return g

g_all = jax.jit(build_g_all)(tiles, bias)

def make_kern(*, stream_g, batched_seg):
    def kern(th_ref, q_ref, *refs):
        if stream_g:
            g_in, out_ref, seg_scratch, hit_scratch = refs
        else:
            tiles_ref, bias_ref, out_ref, g_scratch, seg_scratch, hit_scratch = refs
        t, s = pl.program_id(0), pl.program_id(1)
        @pl.when((t == 0) & (s == 0))
        def _seg():
            row = jax.lax.broadcasted_iota(jnp.int32, (P, SUB), 0) // (P // SUB)
            col = jax.lax.broadcasted_iota(jnp.int32, (P, SUB), 1)
            seg_scratch[:] = (row == col).astype(seg_scratch.dtype)
        if stream_g:
            g = g_in[0]
        else:
            @pl.when(s == 0)
            def _build_g():
                g_scratch[:] = jnp.zeros_like(g_scratch)
                for j in range(L):
                    window = tiles_ref[0, 0:1, pl.ds(j, P)]
                    for b in range(4):
                        g_scratch[4 * j + b, :] = (window[0, :] == b).astype(g_scratch.dtype)
                for i in range(2):
                    g_scratch[4 * L + i, :] = bias_ref[0, i, :].astype(g_scratch.dtype)
            g = g_scratch[:]
        scores = jnp.dot(q_ref[:], g, preferred_element_type=jnp.float32)
        colmax = jnp.max(scores, axis=0, keepdims=True)
        hit = (colmax >= th_ref[0]).astype(jnp.bfloat16)
        @pl.when(s % 8 == 0)
        def _init_out():
            out_ref[:] = jnp.zeros_like(out_ref)
        if not batched_seg:
            cnt = jnp.dot(hit, seg_scratch[:], preferred_element_type=jnp.float32)
            out_ref[0, pl.ds(s % 8, 1), :] = cnt
        else:
            for k in range(8):
                @pl.when(s % 8 == k)
                def _w(k=k):
                    hit_scratch[k : k + 1, :] = hit
            @pl.when(s % 8 == 7)
            def _flush():
                out_ref[0, :, :] = jnp.dot(
                    hit_scratch[:], seg_scratch[:], preferred_element_type=jnp.float32
                )
    return kern

def make_fn(*, stream_g, batched_seg):
    kern = make_kern(stream_g=stream_g, batched_seg=batched_seg)
    n_sb_pad8 = (N_SB + 7) // 8 * 8
    if stream_g:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BS_M, K), lambda t, s: (s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, P), lambda t, s: (t, 0, 0), memory_space=pltpu.VMEM),
        ]
        scratch = [pltpu.VMEM((P, SUB), jnp.bfloat16), pltpu.VMEM((8, P), jnp.bfloat16)]
        inputs = None
    else:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BS_M, K), lambda t, s: (s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P + K // 4), lambda t, s: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, P), lambda t, s: (t, 0, 0), memory_space=pltpu.VMEM),
        ]
        scratch = [
            pltpu.VMEM((K, P), jnp.bfloat16),
            pltpu.VMEM((P, SUB), jnp.bfloat16),
            pltpu.VMEM((8, P), jnp.bfloat16),
        ]
        inputs = None
    f = pl.pallas_call(
        kern,
        grid=(N_TILES, N_SB),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 8, SUB), lambda t, s: (t, s // 8, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_TILES, n_sb_pad8, SUB), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )
    if stream_g:
        return (lambda th, q, t_, b_, g: f(th, q, g)), (q_dev, tiles, bias, g_all)
    return (lambda th, q, t_, b_, g: f(th, q, t_, b_)), (q_dev, tiles, bias, g_all)

def timeit(name, fn_args):
    fn, arrays = fn_args
    @jax.jit
    def loop(th, *arrs):
        def body(i, carry):
            t = th + 0.0 * carry[0, 0, 0]
            return fn(t, *arrs)
        return jax.lax.fori_loop(0, REPS, body, fn(th, *arrs))
    r = np.asarray(loop(th0, *arrays))
    t0 = time.time()
    r = np.asarray(loop(th0, *arrays))
    per = (time.time() - t0) / (REPS + 1)
    pairs = N_TILES * N_SB * BS_M * P
    print(f"{name}: {per*1e3:.2f} ms -> {pairs/per/1e12:.2f}e12 padded pairs/s "
          f"({2*128*pairs/per/1e12:.0f} TF-equiv)  sum={float(np.asarray(r).sum()):.0f}")

timeit("A build+perstep (real)", make_fn(stream_g=False, batched_seg=False))
timeit("B stream+perstep      ", make_fn(stream_g=True, batched_seg=False))
timeit("C build+batched8      ", make_fn(stream_g=False, batched_seg=True))
timeit("D stream+batched8     ", make_fn(stream_g=True, batched_seg=True))
