import time
import numpy as np
from barcoder_tpu.core.encode import decode, encode
from barcoder_tpu.core.genome import Contig, Genome
from barcoder_tpu.pipeline.design import find_candidate_guides
from barcoder_tpu.ops.pallas_scan import pallas_scan

n = 4_600_000
rng = np.random.default_rng(0)
seq = decode(rng.integers(0, 4, size=n).astype(np.int8))
contig = Contig(id="E.1", length=n, codes=encode(seq), seq=seq, topology="circular")
t0 = time.time()
cands = find_candidate_guides(Genome(contigs=[contig]), 20, "NGG")
print(f"enumerate: {time.time()-t0:.1f}s, {len(cands)} candidates")
t0 = time.time()
h = pallas_scan(cands, contig, 1, pam="NGG")  # warm (includes compiles)
print(f"cold scan: {time.time()-t0:.1f}s hits={len(h.pos)}")
t0 = time.time()
h = pallas_scan(cands, contig, 1, pam="NGG")
dt = time.time() - t0
print(f"warm scan: {dt:.1f}s hits={len(h.pos)} -> {len(cands)*n*2/dt:.2e} pairs/s")
