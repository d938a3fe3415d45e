"""Pure-JAX (XLA) Hamming scan — one-hot correlation formulation.

This is the portable device path: scores[s, p] = Σ_j <onehot(q[s, j]),
onehot(g[p + j])> computed as a 1-D convolution, so XLA lowers it to the
matrix unit on TPU and to efficient vectorized code on CPU (where tests run
on fake devices). The Pallas kernel (pallas_scan.py) computes the same
quantity with fused PAM masking and without materializing the S×N score
matrix; this module is its reference semantics.

mismatches(s, p) = L_eff(s) - scores(s, p), where L_eff counts the spacer's
non-N positions... in fact an N in the spacer can never match, so
mismatches = L - scores always (the N position contributes 0 to the score).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..core.genome import Contig
from .prep import build_scan_array, revcomp_matrix, site_masks, spacer_matrix
from .types import STRAND_F, STRAND_R, Hits


def onehot_jnp(codes: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(..., ) int codes → (..., 4); N (code 4) → all-zero row."""
    return (codes[..., None] == jnp.arange(4, dtype=codes.dtype)).astype(dtype)


@functools.partial(jax.jit, static_argnames=("L",))
def _conv_scores(q_onehot: jnp.ndarray, g_chunk_onehot: jnp.ndarray, L: int) -> jnp.ndarray:
    """q_onehot (S, 4, L), g_chunk_onehot (1, 4, P+L-1) → scores (S, P)."""
    out = jax.lax.conv_general_dilated(
        g_chunk_onehot,
        q_onehot,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"),
        preferred_element_type=jnp.float32,
    )
    return out[0]


def dense_mismatches(
    q_codes: np.ndarray, scan_codes: np.ndarray, n_starts: int, chunk: int = 1 << 17
) -> np.ndarray:
    """(S, n_starts) int32 mismatch-count matrix (host array), computed in
    position chunks to bound memory."""
    S, L = q_codes.shape
    q_oh = jnp.asarray(np.transpose(_onehot_np(q_codes), (0, 2, 1)))  # (S, 4, L)
    scan = np.asarray(scan_codes)
    out = np.empty((S, n_starts), dtype=np.int32)
    for p0 in range(0, n_starts, chunk):
        p1 = min(p0 + chunk, n_starts)
        g = scan[p0 : p1 + L - 1]
        g_oh = jnp.asarray(_onehot_np(g[None, :]).transpose(0, 2, 1))  # (1, 4, P+L-1)
        scores = _conv_scores(q_oh, g_oh, L)
        out[:, p0:p1] = L - np.asarray(scores, dtype=np.int32)
    return out


def _onehot_np(codes: np.ndarray) -> np.ndarray:
    out = np.zeros(codes.shape + (4,), dtype=np.float32)
    for b in range(4):
        out[..., b] = codes == b
    return out


@functools.partial(jax.jit, static_argnames=("L", "thresh"))
def _chunk_hitmask(q_oh, g_oh, mask_chunk, L: int, thresh: int):
    """scores → (mismatch_matrix int32, selected bool) for one position chunk,
    with the site mask fused so only PAM-valid positions survive."""
    scores = _conv_scores(q_oh, g_oh, L)
    mm = (L - scores).astype(jnp.int32)
    sel = (mm <= thresh) & mask_chunk[None, :]
    return mm, sel


@functools.partial(jax.jit, static_argnames=("L", "K", "thresh"))
def _chunk_hitmask_mm(q_oh_rows, g_codes, mask_chunk, L: int, K: int, thresh: int):
    """Matmul formulation of the chunk scorer: q_oh_rows (S_pad, K) one-hot
    rows (layout 4j+b), g_codes (P + L - 1,) int32 → same contract as
    _chunk_hitmask. Shares the G build with the Pallas phase-2 path and
    lowers to plain GEMM — much faster than the conv path on CPU backends."""
    from .pallas_scan import _build_g_onehot

    P = mask_chunk.shape[0]
    g_oh = _build_g_onehot(g_codes, L=L, K=K, P=P)  # (K, P)
    scores = jnp.dot(q_oh_rows, g_oh, preferred_element_type=jnp.float32)
    mm = (L - scores).astype(jnp.int32)
    sel = (mm <= thresh) & mask_chunk[None, :]
    return mm, sel


def jax_scan(
    spacers: list[str] | np.ndarray,
    contig: Contig,
    max_mismatches: int,
    pam: str = "",
    pam_direction: str = "downstream",
    chunk: int = 1 << 17,
) -> Hits:
    """Same contract as oracle_scan, via XLA convolution; hits are extracted
    per position chunk so the dense S×N score matrix is never materialized."""
    q_f = spacer_matrix(list(spacers)) if not isinstance(spacers, np.ndarray) else spacers
    S, L = q_f.shape
    q_r = revcomp_matrix(q_f)
    scan = build_scan_array(contig, L)
    n = contig.length
    n_starts = min(n, len(scan) - L + 1) if len(scan) >= L else 0
    mask_f, mask_r = site_masks(contig, L, pam, pam_direction)

    # pad shapes to stable buckets so XLA compiles are reused across calls:
    # spacer count to the next power of two (all-N pad rows never match),
    # position chunks to the full chunk width (N codes + False mask).
    chunk = min(chunk, max(256, 1 << (n_starts - 1).bit_length()))
    S_pad = max(8, 1 << (S - 1).bit_length())
    pad_rows = np.full((S_pad - S, L), 4, dtype=q_f.dtype)

    from .pallas_scan import onehot_rows

    K = max(-(-4 * L // 128) * 128, 128)
    out = []
    for strand, q, mask in ((STRAND_F, q_f, mask_f), (STRAND_R, q_r, mask_r)):
        q_oh = jnp.asarray(onehot_rows(np.concatenate([q, pad_rows]), K), dtype=jnp.float32)
        for p0 in range(0, n_starts, chunk):
            p1 = min(p0 + chunk, n_starts)
            g = np.full(chunk + L - 1, 4, dtype=np.int32)
            g[: p1 + L - 1 - p0] = scan[p0 : p1 + L - 1]
            m = np.zeros(chunk, dtype=bool)
            m[: p1 - p0] = mask[p0:p1]
            mm, sel = _chunk_hitmask_mm(
                q_oh, jnp.asarray(g), jnp.asarray(m), L, K, int(max_mismatches)
            )
            sel = np.asarray(sel)
            if sel.any():
                mm = np.asarray(mm)
                sp, pos = np.nonzero(sel)
                keep = sp < S
                sp, pos = sp[keep], pos[keep]
                out.append(
                    Hits(
                        spacer_idx=sp.astype(np.int64),
                        pos=(pos + p0).astype(np.int64),
                        strand=np.full(len(pos), strand, np.int8),
                        mismatches=mm[sp, pos].astype(np.int32),
                    )
                )
    return Hits.concat(out).sorted()
