"""Multi-chip genome-axis sharded scan (shard_map over a 1-D mesh).

Sharding design (SURVEY.md §2/§5: the TPU replacement for the reference's
100 kb-overhang + process-pool parallelism):

  - the genome position axis is split into contiguous per-device blocks of
    B starts; the spacer one-hot matrix is replicated;
  - each device fetches the first H codes of the *next* device's block over
    ICI with ``lax.ppermute`` (ring halo exchange) so windows crossing the
    block boundary score correctly — the circular wrap halo itself is
    materialized once on the host into the scan array (build_scan_array),
    so the ring is uniform;
  - each device builds its overlapped (P + H)-wide tiles and runs the
    phase-1 Pallas count kernel locally (no inter-chip traffic in the hot
    loop);
  - per-spacer-block totals are merged with ``psum`` — the count-merge
    collective that replaces the reference's Counter summation across
    process pools (heuristicount.py:726-737).

Phase-2 exact-hit extraction stays hit-proportional and runs on the host /
single device against the nonzero (block, tile) pairs.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P_

from ..core.genome import Contig
from ..ops.pallas_scan import BS, _cdiv, onehot_rows, scan_counts
from ..ops.prep import build_scan_array, revcomp_matrix, site_masks, spacer_matrix
from ..ops.types import STRAND_F, STRAND_R, Hits
from .mesh import GENOME_AXIS, make_mesh


def _fallback_counts(q_oh, tiles, mask_tiles, *, L, K, P, thresh):
    """Pure-jnp phase-1 counts with the same contract as
    ops.pallas_scan.scan_counts — used on CPU meshes (tests, dryrun)."""
    n_tiles = tiles.shape[0]
    S_pad = q_oh.shape[0]
    n_sblocks = S_pad // BS
    nsb_pad = max(_cdiv(n_sblocks, 128) * 128, 128)

    def per_tile(tile_codes, tile_mask):
        g = tile_codes[0]  # (P + halo,)
        g_oh = jnp.zeros((K, P), dtype=jnp.bfloat16)
        for j in range(L):
            window = jax.lax.dynamic_slice_in_dim(g, j, P)
            for b in range(4):
                g_oh = g_oh.at[4 * j + b, :].set((window == b).astype(jnp.bfloat16))
        scores = jnp.dot(q_oh, g_oh, preferred_element_type=jnp.float32)
        mm = L - scores
        hit = (mm <= thresh) & (tile_mask[0][None, :] > 0)
        per_spacer = hit.sum(axis=1).astype(jnp.int32)  # (S_pad,)
        per_block = per_spacer.reshape(n_sblocks, BS).sum(axis=1)
        return jnp.pad(per_block, (0, nsb_pad - n_sblocks))[None, :]

    return jax.vmap(per_tile)(tiles, mask_tiles)  # (n_tiles, 1, nsb_pad)


def counts_fn_for_platform(platform: str):
    if platform in ("tpu", "axon"):
        return scan_counts
    return _fallback_counts


def sharded_scan_counts(
    q_oh: jnp.ndarray,
    scan_codes: np.ndarray,
    mask: np.ndarray,
    mesh,
    *,
    L: int,
    K: int,
    P: int,
    thresh: int,
    use_pallas: bool | None = None,
):
    """Run phase-1 counts with the genome axis sharded over ``mesh``.

    scan_codes: 1-D int32 scan array (genome + circular wrap halo);
    mask: 1-D bool/int over canonical starts.
    Returns (counts (n_tiles_total, 1, nsb_pad) np.ndarray,
             totals_per_block (nsb_pad,) np.ndarray).
    """
    n_dev = mesh.devices.size
    halo = K // 4
    n_starts = len(mask)
    B = _cdiv(n_starts, n_dev * P) * P  # per-device starts, tile-aligned
    total = n_dev * B

    codes_padded = np.full(total, 4, dtype=np.int32)
    codes_padded[: min(len(scan_codes), total)] = scan_codes[: min(len(scan_codes), total)]
    mask_padded = np.zeros(total, dtype=np.int32)
    mask_padded[:n_starts] = mask[:n_starts]

    codes_blocks = codes_padded.reshape(n_dev, B)
    mask_blocks = mask_padded.reshape(n_dev, B)

    platform = mesh.devices.ravel()[0].platform
    if use_pallas is None:
        use_pallas = platform in ("tpu", "axon")
    counts_fn = scan_counts if use_pallas else _fallback_counts
    perm = [(d, (d - 1) % n_dev) for d in range(n_dev)]
    n_tiles_local = B // P
    tile_idx = (np.arange(n_tiles_local)[:, None] * P + np.arange(P + halo)[None, :])

    def shard_fn(codes_b, mask_b, q):
        codes_local = codes_b[0]  # (B,)
        mask_local = mask_b[0]
        received = jax.lax.ppermute(codes_local[:halo], GENOME_AXIS, perm)
        scanned = jnp.concatenate([codes_local, received])  # (B + halo,)
        tiles = scanned[tile_idx][:, None, :]  # (n_tiles_local, 1, P + halo)
        mask_tiles = mask_local.reshape(n_tiles_local, 1, P)
        counts = counts_fn(q, tiles, mask_tiles, L=L, K=K, P=P, thresh=thresh)
        totals = jax.lax.psum(counts.sum(axis=(0, 1)), GENOME_AXIS)
        return counts[None], totals

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P_(GENOME_AXIS), P_(GENOME_AXIS), P_()),
        out_specs=(P_(GENOME_AXIS), P_()),
        check_vma=False,
    )
    codes_sharded = jax.device_put(
        codes_blocks, NamedSharding(mesh, P_(GENOME_AXIS))
    )
    mask_sharded = jax.device_put(mask_blocks, NamedSharding(mesh, P_(GENOME_AXIS)))
    counts, totals = jax.jit(fn)(codes_sharded, mask_sharded, q_oh)
    counts = np.asarray(counts).reshape(-1, 1, counts.shape[-1])
    return counts, np.asarray(totals)


def sharded_scan(
    spacers,
    contig: Contig,
    max_mismatches: int,
    pam: str = "",
    pam_direction: str = "downstream",
    mesh=None,
    P: int = 2048,
) -> Hits:
    """Full multi-device scan: sharded phase-1 counts + host-side phase-2
    extraction. Same contract as ops.scan.scan_contig."""
    from ..ops.pallas_scan import _extract_chunk, _prep_mask, _prep_tiles

    if mesh is None:
        mesh = make_mesh()
    q_f = spacer_matrix(list(spacers)) if not isinstance(spacers, np.ndarray) else spacers
    S, L = q_f.shape
    K = max(_cdiv(4 * L, 128) * 128, 128)
    q_r = revcomp_matrix(q_f)
    scan = build_scan_array(contig, L).astype(np.int32)
    n = contig.length
    n_starts = min(n, len(scan) - L + 1) if len(scan) >= L else 0
    if n_starts <= 0 or S == 0:
        return Hits()
    mask_f, mask_r = site_masks(contig, L, pam, pam_direction)
    S_pad = max(_cdiv(S, BS) * BS, BS)

    out = []
    for strand, q_codes, mask in ((STRAND_F, q_f, mask_f), (STRAND_R, q_r, mask_r)):
        q_oh = np.zeros((S_pad, K), dtype=np.float32)
        q_oh[:S] = onehot_rows(q_codes, K)
        q_oh_dev = jnp.asarray(q_oh, dtype=jnp.bfloat16)
        counts, _ = sharded_scan_counts(
            q_oh_dev, scan, mask.astype(np.int32), mesh,
            L=L, K=K, P=P, thresh=int(max_mismatches),
        )
        n_sblocks = S_pad // BS
        t_idx, s_idx = np.nonzero(counts[:, 0, :n_sblocks])
        if len(t_idx) == 0:
            continue
        # host-side phase 2 over nonzero pairs (hit-proportional)
        halo = K // 4
        tiles_host = _prep_tiles(scan, n_starts, P, halo)
        mask_tiles_host = _prep_mask(mask.astype(np.int32), n_starts, P)
        n_tiles_host = tiles_host.shape[0]
        for c0 in range(0, len(t_idx), 32):
            tc = t_idx[c0 : c0 + 32]
            sc = s_idx[c0 : c0 + 32]
            in_range = tc < n_tiles_host  # padding tiles carry no hits
            tc, sc = tc[in_range], sc[in_range]
            if len(tc) == 0:
                continue
            nb = len(tc)
            pad = 32 - nb
            tc_p = np.concatenate([tc, np.zeros(pad, tc.dtype)])
            sc_p = np.concatenate([sc, np.zeros(pad, sc.dtype)])
            q_blocks = q_oh_dev.reshape(-1, BS, K)[jnp.asarray(sc_p)]
            mm, hit = _extract_chunk(
                q_blocks,
                jnp.asarray(tiles_host[tc_p]),
                jnp.asarray(mask_tiles_host[tc_p]),
                L=L, K=K, P=P, thresh=int(max_mismatches),
            )
            hit = np.asarray(hit[:nb])
            mm = np.asarray(mm[:nb])
            bi, si, pi = np.nonzero(hit)
            if len(bi) == 0:
                continue
            spacer_idx = sc[bi] * BS + si
            pos = tc[bi] * P + pi
            keep = spacer_idx < S
            out.append(
                Hits(
                    spacer_idx=spacer_idx[keep].astype(np.int64),
                    pos=pos[keep].astype(np.int64),
                    strand=np.full(int(keep.sum()), strand, np.int8),
                    mismatches=mm[bi, si, pi][keep].astype(np.int32),
                )
            )
    return Hits.concat(out).sorted()
