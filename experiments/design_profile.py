"""Instrument the design-scale scan (bench config): time each stage of
_ScanJob/collect with real fetch boundaries."""
import time
import numpy as np
import jax.numpy as jnp
from barcoder_tpu.core.encode import decode, encode
from barcoder_tpu.core.genome import Contig, Genome
from barcoder_tpu.pipeline.design import find_candidate_guides
from barcoder_tpu.ops import pallas_scan as ps
from barcoder_tpu.ops.prep import spacer_matrix

n = 1_000_000
rng = np.random.default_rng(0)
seq = decode(rng.integers(0, 4, size=n).astype(np.int8))
contig = Contig(id="D.1", length=n, codes=encode(seq), seq=seq, topology="circular")
cands = find_candidate_guides(Genome(contigs=[contig]), 20, "NGG")
print("candidates:", len(cands))
q_f = spacer_matrix(list(cands))
h = ps.pallas_scan(q_f, contig, 1, pam="NGG")  # warm
print("hits:", len(h.pos))

t0 = time.time()
prep = ps._QPrep(q_f, 1, "NGG", "downstream", ps.DEFAULT_P, 512)
t1 = time.time()
job = ps._ScanJob(prep, contig, False)
t2 = time.time()
# manually replay collect() with timers
p = prep
packed = np.asarray(job.spec_fut)
t3 = time.time()
n_pairs, n_sig = int(packed[0]), int(packed[1])
print(f"spec: n_pairs={n_pairs} (B={p.spec_B}) n_sig={n_sig} (cap={p.spec_cap})")
t_idx, s_idx, _vals = job._decode_pairs("fused", job._phase1_fused)
t4 = time.time()
print(f"pairs: {len(t_idx)}")
h2 = job.collect.__wrapped__(job) if hasattr(job.collect, "__wrapped__") else None
# run the batched phase-2 directly (job.futures still live)
n_sb_half = p.S_pad // p.bs
rev = s_idx >= n_sb_half
print("fwd pairs:", int((~rev).sum()), "rev pairs:", int(rev.sum()),
      "extract_batch:", p.extract_batch)
t5 = time.time()
hits = job.collect()
t6 = time.time()
print(f"prep {1e3*(t1-t0):.0f} | ship+dispatch {1e3*(t2-t1):.0f} | "
      f"spec fetch {1e3*(t3-t2):.0f} | pair fetch+decode {1e3*(t4-t3):.0f} | "
      f"collect(batched p2, incl refetch) {1e3*(t6-t5):.0f} ms")
total_t0 = time.time()
hits = ps.pallas_scan(q_f, contig, 1, pam="NGG")
print(f"full scan again: {time.time()-total_t0:.2f}s hits={len(hits.pos)}")
