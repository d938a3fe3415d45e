"""Break down the end-to-end E.coli-scale scan (bench config) into
host-prep / upload / phase1+spec dispatch / fetch components."""
import time
import numpy as np
import jax, jax.numpy as jnp

import sys
sys.argv = ["x"]
from barcoder_tpu.core.encode import decode, encode
from barcoder_tpu.core.genome import Contig
from barcoder_tpu.ops import pallas_scan as ps
from barcoder_tpu.ops.prep import spacer_matrix, build_scan_array

N, S, L, PAM, V = 4_600_000, 9_984, 20, "NGG", 3
rng = np.random.default_rng(0)
codes = rng.integers(0, 4, size=N).astype(np.int8)
seq = decode(codes)
contig = Contig(id="B", length=N, codes=encode(seq), seq=seq, topology="circular")
spacers = []
step = N // (S + 1)
pos = 0
while len(spacers) < S:
    pos = (pos + step) % (N - L - 3)
    spacers.append(seq[pos : pos + L])
q_f = spacer_matrix(spacers)

# warm everything once
hits = ps.pallas_scan(q_f, contig, V, PAM, "downstream")
print("hits:", len(hits.pos))

for trial in range(3):
    t0 = time.time()
    prep = ps._QPrep(q_f, V, PAM, "downstream", ps.DEFAULT_P, 512)
    t1 = time.time()
    job = ps._ScanJob(prep, contig, False)   # ships scan array + dispatches
    t2 = time.time()
    h = job.collect()                         # the one fetch
    t3 = time.time()
    print(f"prep {1e3*(t1-t0):.0f} ms | ship+dispatch {1e3*(t2-t1):.0f} ms | "
          f"collect {1e3*(t3-t2):.0f} ms | total {1e3*(t3-t0):.0f} ms  hits={len(h.pos)}")

# isolate: upload alone
scan = build_scan_array(contig, L)
n_starts_b = ps._geom_bucket(N, ps.DEFAULT_P)
sp = ps.prep_scan_padded(contig, scan, L, n_starts_b, 32 + ps.MAX_PAM)
packed = ps._pack_nibbles(sp)
t0 = time.time()
d = jnp.asarray(packed)
d2 = ps._unpack_nibbles(d, total=len(sp))
np.asarray(d2[:8])
print(f"upload {len(packed)/1e6:.1f} MB + unpack + tiny fetch: {1e3*(time.time()-t0):.0f} ms")
