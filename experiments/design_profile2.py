"""Time each stage of the batched phase-2 for the design config."""
import time
import numpy as np
import jax.numpy as jnp
from barcoder_tpu.core.encode import decode, encode
from barcoder_tpu.core.genome import Contig, Genome
from barcoder_tpu.pipeline.design import find_candidate_guides
from barcoder_tpu.ops import pallas_scan as ps
from barcoder_tpu.ops.prep import spacer_matrix
from barcoder_tpu.ops.types import STRAND_F, STRAND_R

n = 1_000_000
rng = np.random.default_rng(0)
seq = decode(rng.integers(0, 4, size=n).astype(np.int8))
contig = Contig(id="D.1", length=n, codes=encode(seq), seq=seq, topology="circular")
cands = find_candidate_guides(Genome(contigs=[contig]), 20, "NGG")
q_f = spacer_matrix(list(cands))
h = ps.pallas_scan(q_f, contig, 1, pam="NGG")  # warm all shapes
print("hits:", len(h.pos))

prep = ps._QPrep(q_f, 1, "NGG", "downstream", ps.DEFAULT_P, 512)
job = ps._ScanJob(prep, contig, False)
p = prep
t0 = time.time()
packed = np.asarray(job.spec_fut)
t1 = time.time()
t_idx, s_idx, _vals = job._decode_pairs("fused", job._phase1_fused)
t2 = time.time()
n_sb_half = p.S_pad // p.bs
rev = s_idx >= n_sb_half
strand_pairs = {STRAND_F: (t_idx[~rev], s_idx[~rev]),
                STRAND_R: (t_idx[rev], s_idx[rev] - n_sb_half)}
bs, K, P2 = p.bs, p.K, p.P2
pending = []
t3 = time.time()
for strand in (STRAND_F, STRAND_R):
    ti, si = strand_pairs[strand]
    if not len(ti):
        continue
    q_blocks_all = p.q_dev[strand].reshape(-1, bs, K)
    for c0 in range(0, len(ti), p.extract_batch):
        tc = ti[c0:c0 + p.extract_batch]; sc = si[c0:c0 + p.extract_batch]
        nb = len(tc)
        bucket = ps._batch_buckets(nb)
        pad = bucket - nb
        tc_p = np.concatenate([tc, np.zeros(pad, tc.dtype)]).astype(np.int32)
        sc_p = np.concatenate([sc, np.zeros(pad, sc.dtype)]).astype(np.int32)
        valid = np.zeros(bucket, dtype=bool); valid[:nb] = True
        cap = max(1 << 14, bucket * 4)
        args = (q_blocks_all, job.scan_dev, job.n_real,
                p.shift_dev[strand], p.pat_dev[strand],
                jnp.asarray(sc_p), jnp.asarray(tc_p), jnp.asarray(valid))
        kw = dict(n_starts=job.n_starts_b, halo=p.halo, L=p.L, K=K, P=P2,
                  thresh=int(p.max_mismatches), circular=job.circular)
        td0 = time.time()
        fut = ps.extract_full(*args, cap=cap, **kw)
        pending.append((strand, nb, cap, fut, args, kw, time.time() - td0))
t4 = time.time()
print(f"spec fetch {1e3*(t1-t0):.0f} | pair decode {1e3*(t2-t1):.0f} | "
      f"dispatch {1e3*(t4-t3):.0f} ms, {len(pending)} batches")
for i, (strand, nb, cap, fut, args, kw, disp) in enumerate(pending):
    tf0 = time.time()
    idx, mm_vals, n_hits, _nr, _mrh = fut
    n_hits = int(n_hits)
    tf1 = time.time()
    retries = 0
    while n_hits > cap:
        cap = max(cap * 2, 1 << (n_hits - 1).bit_length())
        idx, mm_vals, n_hits, _nr, _mrh = ps.extract_full(*args, cap=cap, **kw)
        n_hits = int(n_hits)
        retries += 1
    tf2 = time.time()
    np.asarray(idx); np.asarray(mm_vals)
    tf3 = time.time()
    print(f"batch {i}: nb={nb} hits={n_hits} dispatch {1e3*disp:.0f} | first-wait "
          f"{1e3*(tf1-tf0):.0f} | retries={retries} {1e3*(tf2-tf1):.0f} | "
          f"fetch {1e3*(tf3-tf2):.0f} ms (cap={cap})")
