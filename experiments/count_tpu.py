"""Round-3 device/sharded counting measurement (VERDICT r2 item 5).

1M simulated reads vs 10k barcodes through the TPU-resident DeviceCounter
(2-bit-packed h2d, on-device tally, 1-bit/read d2h) and the ShardedCounter
DP collective on a 1-device mesh. Counts must be exact; throughput is
link-bound on the tunneled dev chip (h2d ~32 MB/s).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH timeout 1800 python experiments/count_tpu.py
"""

import time
import tempfile

import numpy as np

from barcoder_tpu.core.encode import decode
from barcoder_tpu.pipeline.heuristic_count import run_count

rng = np.random.default_rng(1)
barcodes = sorted(
    {decode(rng.integers(0, 4, 20).astype(np.int8)) for _ in range(10_000)}
)
pre, l_fl, r_fl, tail = "ACGTG", "GGTAGCT", "CTTAAGC", "TCCATGGA"
idx = rng.integers(0, len(barcodes), size=1_000_000)
with tempfile.NamedTemporaryFile("w", suffix=".fastq", delete=False) as fh:
    for i in idx:
        r = pre + l_fl + barcodes[i] + r_fl + tail
        fh.write(f"@r\n{r}\n+\n{'I' * len(r)}\n")
    path = fh.name

import jax, jax.numpy as jnp

t0 = time.time()
np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
print("attach_s", round(time.time() - t0, 1), flush=True)

for engine in ("device", "sharded", "vector"):
    best = float("inf")
    for rep in range(3 if engine != "vector" else 2):
        t0 = time.time()
        doc, undoc, total, info = run_count(set(barcodes), path, engine=engine)
        dt = time.time() - t0
        if rep > 0 or engine == "vector":  # first device rep pays compiles
            best = min(best, dt)
        print(f"  {engine} rep{rep}", round(dt, 2), flush=True)
    exact = sum(doc.values()) == len(idx)
    print(engine, "reads_per_s", round(total / best), "exact", exact, flush=True)
