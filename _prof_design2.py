import time
import numpy as np
import jax.numpy as jnp
import barcoder_tpu.ops.pallas_scan as ps
from barcoder_tpu.ops.prep import build_scan_array, spacer_matrix
from barcoder_tpu.ops.types import STRAND_F, STRAND_R
from barcoder_tpu.core.encode import decode, encode
from barcoder_tpu.core.genome import Contig, Genome
from barcoder_tpu.pipeline.design import find_candidate_guides

n = 1_000_000
rng = np.random.default_rng(0)
seq = decode(rng.integers(0, 4, size=n).astype(np.int8))
contig = Contig(id="D.1", length=n, codes=encode(seq), seq=seq, topology="circular")
genome = Genome(contigs=[contig])
cands = find_candidate_guides(genome, 20, "NGG")
print("cands", len(cands), flush=True)

L, V, P, K, halo, SUB, bs = 20, 1, 16384, 128, 32, 128, 512
PAM = "NGG"
halo_total = halo + ps.MAX_PAM
q_f = spacer_matrix(cands)
S = len(cands)
scan = build_scan_array(contig, L)
S_pad = ps._geom_bucket(S, bs)
n_starts_b = ps._geom_bucket(n, P)
scan_padded = ps.prep_scan_padded(contig, scan, L, n_starts_b, halo_total)
scan_dev = ps._unpack_nibbles(jnp.asarray(ps._pack_nibbles(scan_padded)), total=len(scan_padded))
q_pad = np.full((S_pad, L), 4, np.int8); q_pad[:S] = q_f
qf, qr = ps._q_onehot_device(jnp.asarray(q_pad), K=K, fold=True)
q_dev = {STRAND_F: qf, STRAND_R: qr}
shift_f, pat_f, shift_r, pat_r = ps._pam_specs(PAM, "downstream", L)
def pat_arr(p):
    a = np.full(ps.MAX_PAM, 7, np.int8); a[:len(p)] = p; return jnp.asarray(a)
pat_dev = {STRAND_F: pat_arr(pat_f), STRAND_R: pat_arr(pat_r)}
shift_dev = {STRAND_F: jnp.int32(shift_f), STRAND_R: jnp.int32(shift_r)}
thresh_dev = jnp.full((1,), L - V, jnp.float32)
n_real = jnp.int32(n)
pair_cap = 1 << max(14, (S_pad - 1).bit_length())
print("S_pad", S_pad, "pair_cap", pair_cap, flush=True)

for rep in range(2):
    T = {}
    t0 = time.time()
    futs = {st: ps.phase1_full(scan_dev, n_real, q_dev[st], shift_dev[st], pat_dev[st],
            thresh_dev, n_starts=n_starts_b, P=P, halo=halo, L=L, K=K, SUB=SUB,
            BS_M=bs, pair_cap=pair_cap, circular=True) for st in (STRAND_F, STRAND_R)}
    T["p1_dispatch"] = time.time() - t0
    t0 = time.time()
    res = {st: (np.asarray(futs[st][0]), int(futs[st][1])) for st in futs}
    T["p1_fetch"] = time.time() - t0
    print({st: r[1] for st, r in res.items()}, flush=True)

    n_sblocks = S_pad // bs
    n_sb_pad8 = ps._cdiv(n_sblocks, 8) * 8
    P2 = P // SUB
    n_tiles2 = ps._cdiv(n_starts_b, P2)
    t0 = time.time()
    pend = []
    for st in (STRAND_F, STRAND_R):
        pairs, n_pairs = res[st]
        pairs = pairs[:n_pairs]
        t_big = pairs // (n_sb_pad8 * SUB); rem = pairs % (n_sb_pad8 * SUB)
        s_idx = rem // SUB; sub_idx = rem % SUB
        t_idx = t_big * SUB + sub_idx
        inr = t_idx < n_tiles2
        t_idx, s_idx = t_idx[inr], s_idx[inr]
        qb = q_dev[st].reshape(-1, bs, K)
        for c0 in range(0, len(t_idx), ps.EXTRACT_BATCH):
            tc = t_idx[c0:c0+ps.EXTRACT_BATCH]; sc = s_idx[c0:c0+ps.EXTRACT_BATCH]
            nb = len(tc); bucket = ps._batch_buckets(nb)
            tc_p = np.concatenate([tc, np.zeros(bucket-nb, tc.dtype)]).astype(np.int32)
            sc_p = np.concatenate([sc, np.zeros(bucket-nb, sc.dtype)]).astype(np.int32)
            valid = np.zeros(bucket, bool); valid[:nb] = True
            pend.append((nb, ps.extract_full(qb, scan_dev, n_real, shift_dev[st], pat_dev[st],
                jnp.asarray(sc_p), jnp.asarray(tc_p), jnp.asarray(valid),
                n_starts=n_starts_b, halo=halo, L=L, K=K, P=P2, thresh=V, cap=1<<16, circular=True)))
    T["p2_dispatch"] = time.time() - t0
    t0 = time.time()
    tot = 0
    for nb, f in pend:
        idx, mm, nh = f
        tot += int(nh); np.asarray(idx[:8])
    T["p2_fetch"] = time.time() - t0
    print("batches:", len(pend), "hits:", tot, {k: round(v*1e3) for k, v in T.items()}, flush=True)
