"""Scale-headroom check: a 50 Mb (eukaryotic-chromosome-scale) genome vs the
standard 9,984-spacer library on one chip — 11x the bacterial benchmark
genome. Run on the TPU: PYTHONPATH=/root/repo:/root/.axon_site python
experiments/big_genome.py"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from barcoder_tpu.core.encode import decode, encode
from barcoder_tpu.core.genome import Contig
from barcoder_tpu.ops.pallas_scan import pallas_scan

n = 50_000_000
rng = np.random.default_rng(0)
codes = rng.integers(0, 4, size=n).astype(np.int8)
seq = decode(codes)
contig = Contig(id="BIG.1", length=n, codes=encode(seq), seq=seq, topology="linear")
spacers = [seq[p:p+20] for p in range(1000, 1000 + 9984*4001, 4001)][:9984]

import jax, jax.numpy as jnp
t0=time.time(); np.asarray(jnp.ones((8,8)) @ jnp.ones((8,8))); print(f"attach {time.time()-t0:.1f}s", flush=True)

t0=time.time()
h = pallas_scan(spacers, contig, 3, pam="NGG", P=16384)
print(f"first call {time.time()-t0:.1f}s, hits={len(h)}", flush=True)
best = float("inf")
for _ in range(3):
    t0=time.time()
    h = pallas_scan(spacers, contig, 3, pam="NGG", P=16384)
    best = min(best, time.time()-t0)
pairs = len(spacers) * n * 2
print(f"steady {best:.3f}s = {pairs/best:.3g} pairs/s, hits={len(h)}", flush=True)
