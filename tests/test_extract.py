"""Phase-2 extraction drivers: per-pair-batched vs tile-grouped must agree
with each other and with the oracle (pure-XLA functions, run on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from barcoder_tpu.core.genome import contig_from_record
from barcoder_tpu.ops.oracle import oracle_scan
from barcoder_tpu.ops.pallas_scan import (
    BS,
    _cdiv,
    _prep_mask,
    _prep_tiles,
    extract_hits_for_pairs,
    extract_hits_grouped,
    onehot_rows,
)
from barcoder_tpu.ops.prep import build_scan_array, site_masks, spacer_matrix
from barcoder_tpu.ops.types import STRAND_F, Hits

from .genomes import make_record, plant_guide, random_seq


def tuples(h: Hits):
    return set(zip(h.spacer_idx.tolist(), h.pos.tolist(), h.strand.tolist(), h.mismatches.tolist()))


@pytest.mark.parametrize("grouped", [False, True])
@pytest.mark.slow
def test_extractors_match_oracle(grouped):
    rng = np.random.default_rng(3)
    rec = make_record(n=6000, seed=3)
    spacers = [random_seq(20, rng) for _ in range(6)]
    # plant every spacer at several sites, some shared tiles
    for i, s in enumerate(spacers):
        for p in (100 + 97 * i, 2000 + 31 * i, 4000 + 211 * i, 5900 + 7 * i):
            plant_guide(rec, s, p)
    contig = contig_from_record(rec)
    L, v, P = 20, 0, 512
    K = 128
    q_f = spacer_matrix(spacers)
    S = len(spacers)
    S_pad = BS
    scan = build_scan_array(contig, L).astype(np.int32)
    n_starts = contig.length
    mask_f, _ = site_masks(contig, L, "", "downstream")
    q_oh = np.zeros((S_pad, K), dtype=np.float32)
    q_oh[:S] = onehot_rows(q_f, K)
    q_dev = jnp.asarray(q_oh, dtype=jnp.bfloat16)
    tiles = jnp.asarray(_prep_tiles(scan, n_starts, P, K // 4))
    mask_tiles = jnp.asarray(_prep_mask(mask_f.astype(np.int32), n_starts, P))

    # all (tile, sblock=0) pairs as candidates
    n_tiles = tiles.shape[0]
    t_idx = np.arange(n_tiles)
    s_idx = np.zeros(n_tiles, dtype=np.int64)
    fn = extract_hits_grouped if grouped else extract_hits_for_pairs
    parts = fn(
        t_idx, s_idx, tiles, mask_tiles, q_dev.reshape(-1, BS, K),
        S=S, L=L, K=K, P=P, thresh=v, strand=STRAND_F,
    )
    got = tuples(Hits.concat(parts).sorted())
    want = {
        t for t in tuples(oracle_scan(spacers, contig, v)) if t[2] == STRAND_F
    }
    assert got == want
    assert len(got) >= 20


def test_grouped_chunking_and_valid_mask():
    # more pairs than group_width on one tile: chunking + padding must not
    # duplicate or drop hits
    rng = np.random.default_rng(4)
    rec = make_record(n=1500, seed=4)
    g = random_seq(20, rng)
    for p in (10, 300, 700, 1100):
        plant_guide(rec, g, p)
    contig = contig_from_record(rec)
    L, K, P = 20, 128, 2048
    q_f = spacer_matrix([g])
    scan = build_scan_array(contig, L).astype(np.int32)
    mask_f, _ = site_masks(contig, L, "", "downstream")
    q_oh = np.zeros((BS, K), dtype=np.float32)
    q_oh[:1] = onehot_rows(q_f, K)
    q_dev = jnp.asarray(q_oh, dtype=jnp.bfloat16)
    tiles = jnp.asarray(_prep_tiles(scan, contig.length, P, K // 4))
    mask_tiles = jnp.asarray(_prep_mask(mask_f.astype(np.int32), contig.length, P))
    # duplicate the same (tile 0, sblock 0) pair 5 times with width 2:
    # chunking repeats, so hits appear 5x — verifies chunk bookkeeping by
    # exact multiplicity
    t_idx = np.zeros(5, dtype=np.int64)
    s_idx = np.zeros(5, dtype=np.int64)
    parts = extract_hits_grouped(
        t_idx, s_idx, tiles, mask_tiles, q_dev.reshape(-1, BS, K),
        S=1, L=L, K=K, P=P, thresh=0, strand=STRAND_F, group_width=2,
    )
    all_hits = Hits.concat(parts)
    assert len(all_hits) == 5 * 4
    assert sorted(set(all_hits.pos.tolist())) == [10, 300, 700, 1100]


def test_geom_bucket_properties():
    from barcoder_tpu.ops.pallas_scan import _geom_bucket

    for q in (1, 128, 512, 16384):
        prev = 0
        for n in list(range(1, 4 * q + 3, max(q // 3, 1))) + [10**6, 10**7]:
            b = _geom_bucket(n, q)
            assert b >= n, (n, q, b)
            assert b % q == 0, (n, q, b)
            assert b <= 2 * max(n, q), (n, q, b)  # <= 100% waste floor
            if n > 4 * q:
                assert b < 1.26 * n, (n, q, b)  # fine buckets: <= 25% waste
            assert b >= prev or n < prev, (n, q, b)
            prev = b
