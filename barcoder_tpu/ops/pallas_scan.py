"""Pallas TPU Hamming-scan kernel — the framework's alignment engine.

Replaces Bowtie's FM-index seed-and-extend search (reference:
targets.py:467-539) with the TPU-shaped algorithm: brute-force scoring of
every (spacer, genome position) pair on the MXU via a one-hot matmul.

Formulation
-----------
For spacers of length L, let K = 4L rounded up to the 128-lane contraction
size. Each spacer row is one-hot encoded as Q[s, 4j+b] = 1 iff spacer_s[j]
is base b (N → zero row). For a genome tile of P positions, the kernel
builds G[4j+b, p] = 1 iff genome[p+j] == b directly from int32 base codes in
VMEM (built once per tile, reused across all spacer blocks), then

    scores = Q @ G          # (BS, P) on the MXU, bf16 in / f32 out
    mismatches = L - scores

A position hits iff mismatches <= v and the precomputed PAM/site mask allows
it. The kernel is *two-phase* to avoid materializing the S×N score matrix:

  phase 1 (this kernel): per (spacer-block, tile) hit *counts* — a tiny
      (n_tiles, n_sblocks) output with the threshold + PAM mask fused;
  phase 2 (XLA): re-score only the nonzero (block, tile) pairs — a sparse,
      hit-proportional workload — and emit exact positions + mismatch
      counts.

Speed of light: the matmul spends 2·128·K FLOPs per (spacer, position) pair
scanned with K = 128 for L <= 32 — on one v5e-class chip (~197 bf16
TFLOP/s) that is ~7.5e11 spacer-positions/s, versus Bowtie's ~1e6-1e7/s per
CPU core.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.genome import Contig
from ..utils.jaxcache import enable_compilation_cache
from .prep import build_scan_array, revcomp_matrix, site_masks, spacer_matrix
from .types import STRAND_F, STRAND_R, Hits

enable_compilation_cache()

BS = 128  # spacer block (MXU M dim)
DEFAULT_P = 2048  # genome positions per tile (MXU N dim)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def onehot_rows(q_codes: np.ndarray, K: int) -> np.ndarray:
    """(S, L) codes → (S, K) one-hot rows with layout col = 4*j + base."""
    S, L = q_codes.shape
    out = np.zeros((S, K), dtype=np.float32)
    cols = 4 * np.arange(L)[None, :] + np.clip(q_codes, 0, 3)
    valid = q_codes < 4
    rows = np.broadcast_to(np.arange(S)[:, None], cols.shape)
    out[rows[valid], cols[valid]] = 1.0
    return out


MASK_BIAS = -16384.0  # added to masked-out positions; far below any score


def _scan_max_kernel(q_ref, tiles_ref, bias_ref, out_ref, g_scratch, *, L, K, P):
    """Phase-1 body: max masked score per (spacer-block, tile).

    The epilogue is deliberately minimal — one broadcast add (site/PAM mask
    as additive bias) and one max-reduce per element — because at K=128 the
    matmul spends only ~128 MACs per scored position and any per-element
    VPU work is on the same order as the MXU time."""
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _build_g():
        # G[4j+b, p] = (codes[p+j] == b); padding rows (>= 4L) stay zero.
        @pl.when(4 * L < K)
        def _zero():
            g_scratch[:] = jnp.zeros_like(g_scratch)

        for j in range(L):
            window = tiles_ref[0, 0:1, pl.ds(j, P)]  # (1, P) int32
            for b in range(4):
                g_scratch[4 * j + b, :] = (window[0, :] == b).astype(g_scratch.dtype)

    scores = jnp.dot(
        q_ref[:], g_scratch[:], preferred_element_type=jnp.float32
    )  # (BS, P)
    m = jnp.max(scores + bias_ref[0, 0:1, :])

    @pl.when(s == 0)
    def _init_out():
        out_ref[:] = jnp.full_like(out_ref, MASK_BIAS)

    lane = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 2)
    out_ref[:] = jnp.where(lane == s, m, out_ref[:])


@functools.partial(jax.jit, static_argnames=("L", "K", "P", "interpret"))
def scan_block_max(q_onehot, tiles, bias_tiles, *, L, K, P, interpret=False):
    """Phase 1. q_onehot (S_pad, K) bf16; tiles (n_tiles, 1, P + K//4) int32
    codes (overlapped); bias_tiles (n_tiles, 1, P) f32 (0 where the site/PAM
    mask allows, MASK_BIAS where not).
    Returns (n_tiles, 1, NSB_pad) f32: max masked score per (tile, block);
    a block contains a hit iff its max >= L - v."""
    S_pad = q_onehot.shape[0]
    n_sblocks = S_pad // BS
    n_tiles = tiles.shape[0]
    nsb_pad = max(_cdiv(n_sblocks, 128) * 128, 128)
    tile_w = tiles.shape[2]

    grid = (n_tiles, n_sblocks)
    kernel = functools.partial(_scan_max_kernel, L=L, K=K, P=P)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BS, K), lambda t, s: (s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_w), lambda t, s: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t, s: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, nsb_pad), lambda t, s: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 1, nsb_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((K, P), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * n_sblocks * BS * K * P,
            bytes_accessed=n_tiles * n_sblocks * BS * K * 2 + n_tiles * tile_w * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_onehot, tiles, bias_tiles)


@functools.partial(jax.jit, static_argnames=("L", "K", "P", "thresh", "cap"))
def _extract_chunk(q_oh_blocks, g_tiles, mask_chunk, *, L, K, P, thresh, cap):
    """Phase 2 scoring for a batch of (spacer-block, tile) pairs, with
    on-device hit compaction (only ``cap`` flat indices + mismatch counts
    cross the device boundary — never the dense n×BS×P hit matrix).

    q_oh_blocks (n, BS, K) bf16; g_tiles (n, 1, P + K//4) int32;
    mask_chunk (n, 1, P) int32 →
    (flat_idx int32 (cap,) with -1 fill, mm_vals int32 (cap,),
     n_hits int32 scalar — if n_hits > cap the caller must retry bigger)."""
    n = g_tiles.shape[0]
    g_oh = _build_g_onehot(g_tiles[:, 0, :], L=L, K=K, P=P)
    scores = jnp.einsum(
        "nsk,nkp->nsp", q_oh_blocks, g_oh, preferred_element_type=jnp.float32
    )
    mm = (L - scores).astype(jnp.int32)
    hit = (mm <= thresh) & (mask_chunk[:, 0, :][:, None, :] > 0)
    flat = hit.reshape(-1)
    (idx,) = jnp.nonzero(flat, size=cap, fill_value=-1)
    mm_vals = mm.reshape(-1)[jnp.clip(idx, 0, flat.shape[0] - 1)]
    return idx.astype(jnp.int32), mm_vals, flat.sum().astype(jnp.int32)


def _build_g_onehot(g_flat, *, L, K, P):
    """codes (..., W) → one-hot G (..., K, P) with layout row = 4j+b,
    built from a stacked window tensor in one vectorized compare (keeps the
    XLA graph small — an unrolled .at[].set loop here costs minutes of
    compile time for L=32)."""
    windows = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(g_flat, j, P, axis=-1) for j in range(L)],
        axis=-2,
    )  # (..., L, P)
    onehot = windows[..., :, None, :] == jnp.arange(4, dtype=g_flat.dtype)[None, :, None]
    g4l = onehot.astype(jnp.bfloat16).reshape(*g_flat.shape[:-1], 4 * L, P)
    if 4 * L < K:
        pad = [(0, 0)] * (g4l.ndim - 2) + [(0, K - 4 * L), (0, 0)]
        g4l = jnp.pad(g4l, pad)
    return g4l


@functools.partial(jax.jit, static_argnames=("L", "K", "P", "thresh", "cap"))
def _extract_tile(q_blocks, valid, g_tile, mask_tile, *, L, K, P, thresh, cap):
    """Phase-2 scoring for many spacer blocks against ONE tile (the
    dense-hit path: G is built once and shared across all pairs of the
    tile). q_blocks (m, BS, K) bf16; valid (m,) bool (padding rows off);
    g_tile (1, 1, W) int32; mask_tile (1, 1, P) int32."""
    m = q_blocks.shape[0]
    g_oh = _build_g_onehot(g_tile[0, 0], L=L, K=K, P=P)
    scores = jnp.dot(
        q_blocks.reshape(-1, K), g_oh, preferred_element_type=jnp.float32
    ).reshape(m, BS, P)
    mm = (L - scores).astype(jnp.int32)
    hit = (mm <= thresh) & (mask_tile[0, 0][None, None, :] > 0) & valid[:, None, None]
    flat = hit.reshape(-1)
    (idx,) = jnp.nonzero(flat, size=cap, fill_value=-1)
    mm_vals = mm.reshape(-1)[jnp.clip(idx, 0, flat.shape[0] - 1)]
    return idx.astype(jnp.int32), mm_vals, flat.sum().astype(jnp.int32)


def extract_hits_grouped(
    t_idx: np.ndarray,
    s_idx: np.ndarray,
    tiles,
    mask_tiles,
    q_blocks_all,
    *,
    S: int,
    L: int,
    K: int,
    P: int,
    thresh: int,
    strand: int,
    group_width: int = 512,
) -> list[Hits]:
    """Dense-hit phase-2 driver: pairs grouped by tile so G is built once
    per tile; pair lists chunked to a fixed ``group_width`` for a single
    compiled shape. Used when the nonzero pairs are dense (e.g. the design
    workload, where every candidate guide hits its own site)."""
    out: list[Hits] = []
    order = np.argsort(t_idx, kind="stable")
    t_sorted = t_idx[order]
    s_sorted = s_idx[order]
    boundaries = np.nonzero(np.diff(t_sorted))[0] + 1
    starts = np.concatenate(([0], boundaries))
    ends = np.concatenate((boundaries, [len(t_sorted)]))
    valid_template = np.zeros(group_width, dtype=bool)
    for g0, g1 in zip(starts, ends):
        tile = int(t_sorted[g0])
        sbs = s_sorted[g0:g1]
        for c0 in range(0, len(sbs), group_width):
            chunk = sbs[c0 : c0 + group_width]
            m = len(chunk)
            sc_p = np.zeros(group_width, dtype=chunk.dtype)
            sc_p[:m] = chunk
            valid = valid_template.copy()
            valid[:m] = True
            q_blocks = q_blocks_all[jnp.asarray(sc_p)]
            cap = 1 << 14
            while True:
                idx, mm_vals, n_hits = _extract_tile(
                    q_blocks, jnp.asarray(valid), tiles[tile : tile + 1],
                    mask_tiles[tile : tile + 1],
                    L=L, K=K, P=P, thresh=thresh, cap=cap,
                )
                n_hits = int(n_hits)
                if n_hits <= cap:
                    break
                cap = max(cap * 2, 1 << (n_hits - 1).bit_length())
            idx = np.asarray(idx)[:n_hits]
            mm_vals = np.asarray(mm_vals)[:n_hits]
            if n_hits == 0:
                continue
            mi = idx // (BS * P)
            rem = idx % (BS * P)
            si = rem // P
            pi = rem % P
            spacer_idx = chunk[mi] * BS + si
            pos = tile * P + pi
            keep = spacer_idx < S
            out.append(
                Hits(
                    spacer_idx=spacer_idx[keep].astype(np.int64),
                    pos=pos[keep].astype(np.int64),
                    strand=np.full(int(keep.sum()), strand, np.int8),
                    mismatches=mm_vals[keep].astype(np.int32),
                )
            )
    return out


def extract_hits_for_pairs(
    t_idx: np.ndarray,
    s_idx: np.ndarray,
    tiles,
    mask_tiles,
    q_blocks_all,
    *,
    S: int,
    L: int,
    K: int,
    P: int,
    thresh: int,
    strand: int,
    extract_batch: int = 32,
) -> list[Hits]:
    """Phase-2 driver shared by the single-chip and sharded paths: score the
    nonzero (tile, spacer-block) pairs in fixed-size batches with on-device
    hit compaction, returning Hits fragments."""
    out: list[Hits] = []
    for c0 in range(0, len(t_idx), extract_batch):
        tc = t_idx[c0 : c0 + extract_batch]
        sc = s_idx[c0 : c0 + extract_batch]
        nb = len(tc)
        pad = extract_batch - nb
        tc_p = np.concatenate([tc, np.zeros(pad, tc.dtype)])
        sc_p = np.concatenate([sc, np.zeros(pad, sc.dtype)])
        q_blocks = q_blocks_all[jnp.asarray(sc_p)]
        g_chunk = tiles[jnp.asarray(tc_p)]
        m_chunk = mask_tiles[jnp.asarray(tc_p)]
        cap = 1 << 14
        while True:
            idx, mm_vals, n_hits = _extract_chunk(
                q_blocks, g_chunk, m_chunk, L=L, K=K, P=P, thresh=thresh, cap=cap,
            )
            n_hits = int(n_hits)
            if n_hits <= cap:
                break
            cap = max(cap * 2, 1 << (n_hits - 1).bit_length())
        idx = np.asarray(idx)[:n_hits]
        mm_vals = np.asarray(mm_vals)[:n_hits]
        if n_hits == 0:
            continue
        bi = idx // (BS * P)
        rem = idx % (BS * P)
        si = rem // P
        pi = rem % P
        keep = bi < nb
        bi, si, pi, mm_vals = bi[keep], si[keep], pi[keep], mm_vals[keep]
        spacer_idx = sc[bi] * BS + si
        pos = tc[bi] * P + pi
        keep2 = spacer_idx < S  # padding rows can't hit, but be safe
        out.append(
            Hits(
                spacer_idx=spacer_idx[keep2].astype(np.int64),
                pos=pos[keep2].astype(np.int64),
                strand=np.full(int(keep2.sum()), strand, np.int8),
                mismatches=mm_vals[keep2].astype(np.int32),
            )
        )
    return out


def _prep_tiles(scan_codes: np.ndarray, n_starts: int, P: int, halo: int) -> np.ndarray:
    """(n_tiles, 1, P + halo) int32 overlapped tile matrix; padding positions
    get code 4 (N) so they can never match."""
    n_tiles = _cdiv(n_starts, P)
    padded = np.full(n_tiles * P + halo, 4, dtype=np.int32)
    usable = min(len(scan_codes), len(padded))
    padded[:usable] = scan_codes[:usable]
    view = np.lib.stride_tricks.sliding_window_view(padded, P + halo)[:: P]
    return np.ascontiguousarray(view[:n_tiles])[:, None, :]


def _prep_mask(mask: np.ndarray, n_starts: int, P: int) -> np.ndarray:
    n_tiles = _cdiv(n_starts, P)
    out = np.zeros((n_tiles, 1, P), dtype=np.int32)
    flat = out.reshape(-1)
    flat[:n_starts] = mask[:n_starts]
    return out


def _prep_bias(mask: np.ndarray, n_starts: int, P: int) -> np.ndarray:
    """f32 additive site-mask bias tiles for the phase-1 kernel."""
    return np.where(_prep_mask(mask, n_starts, P) > 0, 0.0, MASK_BIAS).astype(np.float32)


def pallas_scan(
    spacers,
    contig: Contig,
    max_mismatches: int,
    pam: str = "",
    pam_direction: str = "downstream",
    P: int = DEFAULT_P,
    interpret: bool = False,
    extract_batch: int = 32,
) -> Hits:
    """Same contract as oracle_scan/jax_scan, on the TPU MXU."""
    q_f = spacer_matrix(list(spacers)) if not isinstance(spacers, np.ndarray) else spacers
    S, L = q_f.shape
    K = max(_cdiv(4 * L, 128) * 128, 128)
    halo = K // 4  # >= L, keeps tile width lane-aligned
    q_r = revcomp_matrix(q_f)
    scan = build_scan_array(contig, L)
    n = contig.length
    n_starts = min(n, len(scan) - L + 1) if len(scan) >= L else 0
    if n_starts <= 0 or S == 0:
        return Hits()
    mask_f, mask_r = site_masks(contig, L, pam, pam_direction)

    S_pad = max(_cdiv(S, BS) * BS, BS)
    tiles = jnp.asarray(_prep_tiles(scan.astype(np.int32), n_starts, P, halo))
    mask_f_i = mask_f.astype(np.int32)
    mask_r_i = mask_r.astype(np.int32)

    out = []
    for strand, q_codes, mask in ((STRAND_F, q_f, mask_f_i), (STRAND_R, q_r, mask_r_i)):
        q_oh = np.zeros((S_pad, K), dtype=np.float32)
        q_oh[:S] = onehot_rows(q_codes, K)
        q_oh_dev = jnp.asarray(q_oh, dtype=jnp.bfloat16)
        mask_tiles = jnp.asarray(_prep_mask(mask, n_starts, P))
        bias_tiles = jnp.asarray(_prep_bias(mask, n_starts, P))
        block_max = np.asarray(
            scan_block_max(
                q_oh_dev, tiles, bias_tiles, L=L, K=K, P=P, interpret=interpret,
            )
        )[:, 0, :]
        n_sblocks = S_pad // BS
        t_idx, s_idx = np.nonzero(block_max[:, :n_sblocks] >= L - max_mismatches - 0.5)
        if len(t_idx) == 0:
            continue

        # phase 2: exact positions for the nonzero (tile, sblock) pairs,
        # compacted on device (fixed capacity + overflow retry). Sparse
        # pair sets use per-pair batches; dense sets (design workload)
        # group pairs by tile so G is shared.
        n_pair_tiles = len(np.unique(t_idx))
        extractor = (
            extract_hits_grouped
            if len(t_idx) >= 4 * n_pair_tiles
            else extract_hits_for_pairs
        )
        out.extend(
            extractor(
                t_idx, s_idx, tiles, mask_tiles, q_oh_dev.reshape(-1, BS, K),
                S=S, L=L, K=K, P=P, thresh=int(max_mismatches), strand=strand,
            )
        )
    return Hits.concat(out).sorted()
