"""Chromosome-scale single-chip proof (VERDICT r4 item 5): a 250 Mb
(largest-human-chromosome-scale) linear genome vs the standard 9,984-spacer
library on one chip, with 20 PLANTED guides that must be recovered exactly
at their planted positions with 0 mismatches.

Run on the TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python experiments/big_genome.py [size_bp]

Reports: attach, first call (compiles at this geometry), best-of-3 steady,
planted-guide recovery, and the device HBM budget (memory_stats when the
plugin exposes it, plus the analytic budget). Reference caps out at
bacterial scale (targets.py:44-46 loads the genome as a pandas string
column); r4 proved 50 Mb here, this pushes 5x further.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from barcoder_tpu.core.encode import decode, encode
from barcoder_tpu.core.genome import Contig
from barcoder_tpu.ops.pallas_scan import pallas_scan

n = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000_000
L = 20
rng = np.random.default_rng(0)
codes = rng.integers(0, 4, size=n).astype(np.int8)
seq = decode(codes)

# plant 20 known guides (guide + TGG PAM) at known positions, forward strand
planted = []
for i in range(20):
    pos = n // 50 + i * (n - n // 25 - L - 3) // 20
    g = decode(rng.integers(0, 4, size=L).astype(np.int8))
    seq = seq[:pos] + g + "TGG" + seq[pos + L + 3 :]
    planted.append((g, pos))
codes = encode(seq)
contig = Contig(id="BIG.1", length=n, codes=codes, seq=seq, topology="linear")

# library: 9,964 genome-derived spacers + the 20 planted guides
step = (n - 2000 - L) // 9964
positions = 1000 + np.arange(9964) * step
spacers = [seq[int(p) : int(p) + L] for p in positions]
spacers += [g for g, _ in planted]

import jax, jax.numpy as jnp
t0 = time.time(); np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
print(f"attach {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
h = pallas_scan(spacers, contig, 3, pam="NGG", P=16384)
print(f"first call {time.time()-t0:.1f}s, hits={len(h)}", flush=True)
best = float("inf")
for _ in range(3):
    t0 = time.time()
    h = pallas_scan(spacers, contig, 3, pam="NGG", P=16384)
    best = min(best, time.time() - t0)
pairs = len(spacers) * n * 2
print(f"steady {best:.3f}s = {pairs/best:.3g} pairs/s, hits={len(h)}", flush=True)

# planted-guide recovery: every planted guide at its position, F (strand
# code 0, ops/types.py STRAND_F), mm=0
found = {
    (int(si), int(p))
    for si, p, st, mm in zip(h.spacer_idx, h.pos, h.strand, h.mismatches)
    if mm == 0 and st == 0
}
ok = 0
for j, (g, pos) in enumerate(planted):
    si = 9964 + j
    if (si, pos) in found:
        ok += 1
    else:
        print(f"MISSING planted guide {j} at {pos}", flush=True)
print(f"planted recovered: {ok}/20", flush=True)

# HBM budget
try:
    ms = jax.devices()[0].memory_stats()
    if ms:
        print(
            "device memory_stats: "
            f"in_use={ms.get('bytes_in_use', 0)/1e9:.2f} GB "
            f"peak={ms.get('peak_bytes_in_use', 0)/1e9:.2f} GB "
            f"limit={ms.get('bytes_limit', 0)/1e9:.2f} GB",
            flush=True,
        )
except Exception as e:  # plugin may not expose stats over the tunnel
    print(f"memory_stats unavailable: {e}", flush=True)
print(
    "analytic budget: genome codes int8 "
    f"{n/1e9:.2f} GB; NGG site table ~= n*2/16 sites x (L+pad) "
    f"~= {n*2/16*32/1e9:.2f} GB (site mode); dense tile working set "
    "P x K x few bufs ~= tens of MB",
    flush=True,
)
