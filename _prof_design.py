import time, sys
import numpy as np
from barcoder_tpu.core.encode import decode, encode
from barcoder_tpu.core.genome import Contig, Genome

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
rng = np.random.default_rng(0)
seq = decode(rng.integers(0, 4, size=n).astype(np.int8))
contig = Contig(id="D.1", length=n, codes=encode(seq), seq=seq, topology="circular")
genome = Genome(contigs=[contig])

from barcoder_tpu.pipeline.design import find_candidate_guides
t0 = time.time()
cands = find_candidate_guides(genome, 20, "NGG")
print(f"candidates: {len(cands)} in {time.time()-t0:.2f}s", flush=True)

from barcoder_tpu.ops.scan import scan_genome
t0 = time.time()
hits = scan_genome(cands, genome, 1, pam="NGG")
dt = time.time() - t0
nh = sum(len(h.pos) for h in hits.values())
print(f"offtarget scan: {nh} hits in {dt:.2f}s ({len(cands)*n*2/dt:.2e} pairs/s)")
