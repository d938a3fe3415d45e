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

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P_

from ..core.genome import Contig
from ..ops.pallas_scan import BS, MASK_BIAS, _cdiv, onehot_rows, scan_block_max
from ..ops.prep import build_scan_array, revcomp_matrix, site_masks, spacer_matrix
from ..ops.types import STRAND_F, STRAND_R, Hits
from .mesh import GENOME_AXIS, LIBRARY_AXIS, make_mesh


def _mesh_dims(mesh) -> tuple[int, int]:
    """(n_library, n_genome) shard counts of ``mesh`` (1-D meshes have no
    library axis → n_library=1)."""
    shape = dict(mesh.shape)
    return shape.get(LIBRARY_AXIS, 1), shape[GENOME_AXIS]


def _lib_layout(n_lib: int, S_pad: int) -> tuple[int, int, int, int]:
    """Per-library-shard spacer layout: (S_loc, S_tot, nsb_local,
    nsb_pad_local). Every shard holds S_loc one-hot rows (nsb_local blocks
    of BS); the phase-1 kernel pads its block axis to nsb_pad_local
    lanes, so the gathered global block-max carries nsb_pad_local columns
    per shard of which only the first nsb_local are real."""
    S_loc = _cdiv(S_pad, n_lib * BS) * BS
    nsb_local = S_loc // BS
    nsb_pad_local = max(_cdiv(nsb_local, 128) * 128, 128)
    return S_loc, S_loc * n_lib, nsb_local, nsb_pad_local


def _fallback_block_max(q_oh, tiles, bias_tiles, *, L, K, P):
    """Pure-jnp phase-1 with the same contract as
    ops.pallas_scan.scan_block_max — used on CPU meshes (tests, dryrun)."""
    n_tiles = tiles.shape[0]
    S_pad = q_oh.shape[0]
    n_sblocks = S_pad // BS
    nsb_pad = max(_cdiv(n_sblocks, 128) * 128, 128)

    from ..ops.pallas_scan import _build_g_onehot

    def per_tile(tile_codes, tile_bias):
        g_oh = _build_g_onehot(tile_codes[0], L=L, K=K, P=P)
        scores = jnp.dot(q_oh, g_oh, preferred_element_type=jnp.float32)
        biased = scores + tile_bias[0][None, :]
        per_block = biased.reshape(n_sblocks, BS, P).max(axis=(1, 2))
        return jnp.pad(
            per_block, (0, nsb_pad - n_sblocks), constant_values=MASK_BIAS
        )[None, :]

    return jax.vmap(per_tile)(tiles, bias_tiles)  # (n_tiles, 1, nsb_pad)


def sharded_scan_block_max(
    q_oh: jnp.ndarray,
    scan_codes: np.ndarray,
    mask: np.ndarray,
    mesh,
    *,
    L: int,
    K: int,
    P: int,
    use_pallas: bool | None = None,
):
    """Run phase-1 block-max scoring with the genome axis sharded over
    ``mesh`` — and, on a 2-D ``(library, genome)`` mesh (make_mesh_2d), the
    spacer-block axis sharded too (the TP analog: each device holds only
    S_pad/n_library one-hot rows, so libraries larger than one device's
    memory scan without replication).

    scan_codes: 1-D int32 scan array (genome + circular wrap halo);
    mask: 1-D bool/int over canonical starts.
    Returns (block_max (n_tiles_total, 1, n_lib * nsb_pad_local) np.ndarray
             — per-library-shard column groups, see _lib_layout;
             global_best (n_lib * nsb_pad_local,) np.ndarray — psum-merged
             per-block hit tallies demonstrating the count-merge collective).
    """
    n_lib, n_gen = _mesh_dims(mesh)
    halo = K // 4
    n_starts = len(mask)
    B = _cdiv(n_starts, n_gen * P) * P  # per-device starts, tile-aligned
    total = n_gen * B

    codes_padded = np.full(total, 4, dtype=np.int32)
    codes_padded[: min(len(scan_codes), total)] = scan_codes[: min(len(scan_codes), total)]
    mask_padded = np.zeros(total, dtype=np.int32)
    mask_padded[:n_starts] = mask[:n_starts]

    codes_blocks = codes_padded.reshape(n_gen, B)
    bias_blocks = np.where(mask_padded > 0, 0.0, MASK_BIAS).astype(np.float32).reshape(n_gen, B)

    _, S_tot, _, _ = _lib_layout(n_lib, q_oh.shape[0])
    if S_tot != q_oh.shape[0]:  # zero rows never beat MASK_BIAS-free scores
        q_oh = jnp.concatenate(
            [q_oh, jnp.zeros((S_tot - q_oh.shape[0], q_oh.shape[1]), q_oh.dtype)]
        )

    platform = mesh.devices.ravel()[0].platform
    if use_pallas is None:
        use_pallas = platform in ("tpu", "axon")
    phase1_fn = scan_block_max if use_pallas else _fallback_block_max
    perm = [(d, (d - 1) % n_gen) for d in range(n_gen)]
    n_tiles_local = B // P
    tile_idx = (np.arange(n_tiles_local)[:, None] * P + np.arange(P + halo)[None, :])

    def shard_fn(codes_b, bias_b, q):
        codes_local = codes_b[0]  # (B,)
        bias_local = bias_b[0]
        received = jax.lax.ppermute(codes_local[:halo], GENOME_AXIS, perm)
        scanned = jnp.concatenate([codes_local, received])  # (B + halo,)
        tiles = scanned[tile_idx][:, None, :]  # (n_tiles_local, 1, P + halo)
        bias_tiles = bias_local.reshape(n_tiles_local, 1, P)
        block_max = phase1_fn(q, tiles, bias_tiles, L=L, K=K, P=P)
        # psum-merged per-block hit tallies: the collective count merge
        totals = jax.lax.psum(
            (block_max >= 0.0).sum(axis=(0, 1)).astype(jnp.int32), GENOME_AXIS
        )
        return block_max[None], totals

    lib_spec = P_(LIBRARY_AXIS) if n_lib > 1 else P_()
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P_(GENOME_AXIS), P_(GENOME_AXIS), lib_spec),
        out_specs=(
            P_(GENOME_AXIS, None, None, LIBRARY_AXIS) if n_lib > 1 else P_(GENOME_AXIS),
            lib_spec,
        ),
        check_vma=False,
    )
    codes_sharded = jax.device_put(
        codes_blocks, NamedSharding(mesh, P_(GENOME_AXIS))
    )
    bias_sharded = jax.device_put(bias_blocks, NamedSharding(mesh, P_(GENOME_AXIS)))
    q_sharded = jax.device_put(q_oh, NamedSharding(mesh, lib_spec))
    block_max, totals = jax.jit(fn)(codes_sharded, bias_sharded, q_sharded)
    block_max = np.asarray(block_max).reshape(-1, 1, block_max.shape[-1])
    return block_max, np.asarray(totals)


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
    from ..ops.pallas_scan import _prep_mask, _prep_tiles, extract_hits_for_pairs

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
    n_lib, _ = _mesh_dims(mesh)
    _, S_tot, nsb_local, nsb_pad_local = _lib_layout(n_lib, S_pad)
    # map a gathered block-max column (shard-major, nsb_pad_local per shard)
    # back to its global spacer block; padding lanes → -1
    col_to_sblock = np.full(n_lib * nsb_pad_local, -1, dtype=np.int64)
    for shard in range(n_lib):
        col_to_sblock[
            shard * nsb_pad_local : shard * nsb_pad_local + nsb_local
        ] = shard * nsb_local + np.arange(nsb_local)

    out = []
    for strand, q_codes, mask in ((STRAND_F, q_f, mask_f), (STRAND_R, q_r, mask_r)):
        q_oh = np.zeros((S_tot, K), dtype=np.float32)
        q_oh[:S] = onehot_rows(q_codes, K)
        q_oh_dev = jnp.asarray(q_oh, dtype=jnp.bfloat16)
        block_max, _ = sharded_scan_block_max(
            q_oh_dev, scan, mask.astype(np.int32), mesh, L=L, K=K, P=P,
        )
        t_idx, col_idx = np.nonzero(block_max[:, 0, :] >= L - max_mismatches - 0.5)
        s_idx = col_to_sblock[col_idx]
        real = s_idx >= 0  # padding lanes of each shard
        t_idx, s_idx = t_idx[real], s_idx[real]
        if len(t_idx) == 0:
            continue
        # host-side phase 2 over nonzero pairs (hit-proportional)
        halo = K // 4
        tiles_host = jnp.asarray(_prep_tiles(scan, n_starts, P, halo))
        mask_tiles_host = jnp.asarray(_prep_mask(mask.astype(np.int32), n_starts, P))
        n_tiles_host = tiles_host.shape[0]
        in_range = t_idx < n_tiles_host  # padding tiles carry no hits
        t_idx, s_idx = t_idx[in_range], s_idx[in_range]
        out.extend(
            extract_hits_for_pairs(
                t_idx, s_idx, tiles_host, mask_tiles_host,
                q_oh_dev.reshape(-1, BS, K),
                S=S, L=L, K=K, P=P, thresh=int(max_mismatches), strand=strand,
            )
        )
    return Hits.concat(out).sorted()
