import time
import numpy as np
from barcoder_tpu.core.encode import decode, encode
from barcoder_tpu.core.genome import Contig, Genome
from barcoder_tpu.pipeline.design import find_candidate_guides
from barcoder_tpu.ops.pallas_scan import pallas_scan

for n, label in ((1_000_000, "1Mb"), (4_600_000, "E.coli")):
    rng = np.random.default_rng(0)
    seq = decode(rng.integers(0, 4, size=n).astype(np.int8))
    contig = Contig(id=f"D{n}.1", length=n, codes=encode(seq), seq=seq, topology="circular")
    cands = find_candidate_guides(Genome(contigs=[contig]), 20, "NGG")
    for mode in ("always", "auto"):
        h = pallas_scan(cands, contig, 1, pam="NGG", site_mode=mode)  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            h = pallas_scan(cands, contig, 1, pam="NGG", site_mode=mode)
            best = min(best, time.time() - t0)
        print(f"{label} site_mode={mode}: {best:.2f}s hits={len(h.pos)} "
              f"({len(cands)*n*2/best:.2e} pairs/s)")
