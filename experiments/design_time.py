import time
import numpy as np
from barcoder_tpu.core.encode import decode, encode
from barcoder_tpu.core.genome import Contig, Genome
from barcoder_tpu.pipeline.design import find_candidate_guides
from barcoder_tpu.ops.pallas_scan import pallas_scan
from barcoder_tpu.ops.prep import spacer_matrix

n = 1_000_000
rng = np.random.default_rng(0)
seq = decode(rng.integers(0, 4, size=n).astype(np.int8))
contig = Contig(id="D.1", length=n, codes=encode(seq), seq=seq, topology="circular")
cands = find_candidate_guides(Genome(contigs=[contig]), 20, "NGG")
q_f = spacer_matrix(list(cands))
h = pallas_scan(q_f, contig, 1, pam="NGG")  # warm
for _ in range(3):
    t0 = time.time()
    h = pallas_scan(q_f, contig, 1, pam="NGG")
    print(f"design scan: {time.time()-t0:.2f}s hits={len(h.pos)}")
