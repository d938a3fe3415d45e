"""Benchmark the REAL scan_block_hits kernel at E.coli bench shapes inside
a fori_loop jit (one fetch), plus ablations to find the epilogue cost."""
import functools, time, sys
import numpy as np
import jax, jax.numpy as jnp
from barcoder_tpu.ops import pallas_scan as ps

L, K, P, SUB, BS_M = 20, 128, 16384, 32, 512
N_TILES = 320            # E.coli bucketed: 5.24 Mb
S_PAD2 = 20480           # fused fwd+rev
N_SB = S_PAD2 // BS_M    # 40
REPS = 5

rng = np.random.default_rng(0)
q_codes = rng.integers(0, 4, (S_PAD2, L)).astype(np.int8)
q_oh = np.zeros((S_PAD2, K), np.float32)
for j in range(L):
    q_oh[np.arange(S_PAD2), 4 * j + q_codes[:, j]] = 1.0
q_oh[:, 4 * L] = 1.0  # folded-bias constant column
q_dev = jnp.asarray(q_oh, jnp.bfloat16)
tiles = jnp.asarray(rng.integers(0, 4, (N_TILES, 1, P + K // 4)).astype(np.int32))
bias = jnp.asarray((rng.random((N_TILES, 2, P)) < 0.05).astype(np.float32) * 0.0)
th0 = jnp.full((1,), float(L - 3), jnp.float32)

def timeit(name, fn):
    @jax.jit
    def loop(th):
        def body(i, carry):
            t = th + 0.0 * carry[0, 0, 0]
            return fn(t)
        return jax.lax.fori_loop(0, REPS, body, fn(th))
    r = np.asarray(loop(th0))  # warm/compile
    t0 = time.time()
    r = np.asarray(loop(th0))
    per = (time.time() - t0) / (REPS + 1)
    pairs = N_TILES * N_SB * BS_M * P
    print(f"{name}: {per*1e3:.2f} ms -> {pairs/per/1e12:.2f}e12 padded pairs/s "
          f"({2*128*pairs/per/1e12:.0f} TF-equiv)")

timeit("scan_block_hits (real)", lambda th: ps.scan_block_hits(
    th, q_dev, tiles, bias, L=L, K=K, P=P, SUB=SUB, BS_M=BS_M, fold_bias=True))

# ---- ablations ----
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def make_variant(*, build_g, do_hit, do_seg, seg_batch=1):
    def kern(th_ref, q_ref, tiles_ref, bias_ref, out_ref, g_scratch, seg_scratch,
             hit_scratch):
        t, s = pl.program_id(0), pl.program_id(1)
        if do_seg:
            @pl.when((t == 0) & (s == 0))
            def _seg():
                row = jax.lax.broadcasted_iota(jnp.int32, (P, SUB), 0) // (P // SUB)
                col = jax.lax.broadcasted_iota(jnp.int32, (P, SUB), 1)
                seg_scratch[:] = (row == col).astype(seg_scratch.dtype)
        if build_g:
            @pl.when(s == 0)
            def _build_g():
                g_scratch[:] = jnp.zeros_like(g_scratch)
                for j in range(L):
                    window = tiles_ref[0, 0:1, pl.ds(j, P)]
                    for b in range(4):
                        g_scratch[4 * j + b, :] = (window[0, :] == b).astype(g_scratch.dtype)
                for i in range(2):
                    g_scratch[4 * L + i, :] = bias_ref[0, i, :].astype(g_scratch.dtype)
        scores = jnp.dot(q_ref[:], g_scratch[:], preferred_element_type=jnp.float32)
        colmax = jnp.max(scores, axis=0, keepdims=True)  # (1, P)
        @pl.when(s % 8 == 0)
        def _init_out():
            out_ref[:] = jnp.zeros_like(out_ref)
        if not do_hit:
            out_ref[0, pl.ds(s % 8, 1), :] = colmax[0:1, :SUB]
            return
        hit = (colmax >= th_ref[0]).astype(jnp.bfloat16)
        if not do_seg:
            out_ref[0, pl.ds(s % 8, 1), :] = hit[0:1, :SUB].astype(jnp.float32)
            return
        if seg_batch == 1:
            cnt = jnp.dot(hit, seg_scratch[:], preferred_element_type=jnp.float32)
            out_ref[0, pl.ds(s % 8, 1), :] = cnt
        else:
            hit_scratch[pl.ds(s % 8, 1), :] = hit
            @pl.when(s % 8 == 7)
            def _flush():
                cnt8 = jnp.dot(hit_scratch[:], seg_scratch[:],
                               preferred_element_type=jnp.float32)  # (8, SUB)
                out_ref[0, :, :] = cnt8

    n_sb_pad8 = (N_SB + 7) // 8 * 8
    def run_fn(th):
        return pl.pallas_call(
            kern,
            grid=(N_TILES, N_SB),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((BS_M, K), lambda t, s: (s, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, P + K // 4), lambda t, s: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, P), lambda t, s: (t, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, SUB), lambda t, s: (t, s // 8, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_TILES, n_sb_pad8, SUB), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((K, P), jnp.bfloat16),
                pltpu.VMEM((P, SUB), jnp.bfloat16),
                pltpu.VMEM((8, P), jnp.bfloat16),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
        )(th, q_dev, tiles, bias)
    return run_fn

timeit("colmax only (G built)", make_variant(build_g=True, do_hit=False, do_seg=False))
timeit("hit, no seg (G built)", make_variant(build_g=True, do_hit=True, do_seg=False))
timeit("hit+seg batched8     ", make_variant(build_g=True, do_hit=True, do_seg=True, seg_batch=8))
timeit("hit+seg per-step     ", make_variant(build_g=True, do_hit=True, do_seg=True, seg_batch=1))
