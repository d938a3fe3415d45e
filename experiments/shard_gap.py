"""Localize the sharded-vs-single per-device gap (VERDICT r2 item 1).

One process: bench workload (4.6 Mb x 9,984), single-chip site engine vs
sharded site engine on a 1-device mesh, with the sharded scan's
host_prep/dispatch/fetch/decode breakdown from
parallel.sharded_scan.LAST_TIMINGS.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH timeout 2400 python experiments/shard_gap.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from barcoder_tpu.core.encode import decode, encode
from barcoder_tpu.core.genome import Contig
from barcoder_tpu.ops.pallas_scan import pallas_scan
from barcoder_tpu.parallel.mesh import make_mesh
from barcoder_tpu.parallel import sharded_scan as ss

N, S, L, P = 4_600_000, 9_984, 20, 16384
rng = np.random.default_rng(0)
seq = decode(rng.integers(0, 4, size=N).astype(np.int8))
contig = Contig(id="BENCH0.1", length=N, codes=encode(seq), seq=seq,
                topology="circular")
spacers = [seq[p : p + L] for p in range(64, 64 + S * 11, 11)][:S]

t0 = time.time()
np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
print("attach_s", round(time.time() - t0, 1), flush=True)

for _ in range(2):
    hits = pallas_scan(spacers, contig, 1, pam="NGG", P=P)
best = float("inf")
for _ in range(5):
    t0 = time.time()
    hits = pallas_scan(spacers, contig, 1, pam="NGG", P=P)
    best = min(best, time.time() - t0)
print("single_chip_s", round(best, 4), "hits", len(hits), flush=True)

mesh = make_mesh(1)
for _ in range(2):
    sh = ss.sharded_scan(spacers, contig, 1, pam="NGG", mesh=mesh, P=P)
best, best_t = float("inf"), None
for _ in range(5):
    t0 = time.time()
    sh = ss.sharded_scan(spacers, contig, 1, pam="NGG", mesh=mesh, P=P)
    dt = time.time() - t0
    if dt < best:
        best, best_t = dt, dict(ss.LAST_TIMINGS)
print("sharded_s", round(best, 4), "hits", len(sh), flush=True)
print("breakdown", {k: (round(v, 4) if isinstance(v, float) else v)
                    for k, v in best_t.items()}, flush=True)
