#!/bin/bash
# Round-3 TPU measurement battery. ONE TPU process at a time, everything
# under its own timeout, results land in /tmp/r3_*.json|txt.
cd /root/repo
set -x

# 0. probe (cheap; bail early if the chip is wedged)
timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
print('probe', np.asarray(jnp.ones((8,8)) @ jnp.ones((8,8))).sum())" \
  > /tmp/r3_probe.txt 2>&1 || { echo WEDGED > /tmp/r3_status.txt; exit 1; }

# 1. persistent-cache cross-process check: same tiny scan twice, fresh
# processes; second run should be (nearly) all cache hits
for i in 1 2; do
timeout 900 python -c "
import time, numpy as np
from barcoder_tpu.utils.profiling import compile_stats
cs = compile_stats()
import jax
b = jax.devices()[0].client
print('platform_version', repr(getattr(b, 'platform_version', None)))
print('runtime_type', repr(getattr(b, 'runtime_type', None)))
from barcoder_tpu.ops.pallas_scan import pallas_scan
from barcoder_tpu.core.encode import decode, encode
from barcoder_tpu.core.genome import Contig
rng = np.random.default_rng(0)
n = 1 << 20
seq = decode(rng.integers(0, 4, size=n).astype(np.int8))
contig = Contig(id='CC.1', length=n, codes=encode(seq), seq=seq, topology='circular')
spacers = [seq[p:p+20] for p in range(64, 64+512*13, 13)][:512]
t0 = time.time()
hits = pallas_scan(spacers, contig, 1, pam='NGG')
print('run$i first_call_s', round(time.time()-t0, 2), 'hits', len(hits))
print('run$i stats', cs.snapshot())
" > /tmp/r3_cache_$i.txt 2>&1
done

# 2. full bench (cold process; includes first_call compile budget, cn32,
# distill x2, counting, design)
timeout 2400 python bench.py --inner > /tmp/r3_bench.json 2>/tmp/r3_bench.err

# 3. sharded-vs-single on the real chip (1-device mesh)
timeout 1800 python -m barcoder_tpu.parallel.scaling 4600000 9984 \
  --engine flagship --single-chip > /tmp/r3_scaling.json 2>/tmp/r3_scaling.err

# 4. device + sharded counting engines on the TPU (VERDICT item 5)
timeout 1800 python -c "
import time, tempfile, numpy as np
from barcoder_tpu.core.encode import decode
from barcoder_tpu.pipeline.heuristic_count import run_count
rng = np.random.default_rng(1)
barcodes = sorted({decode(rng.integers(0, 4, 20).astype(np.int8)) for _ in range(10_000)})
pre, l_fl, r_fl, tail = 'ACGTG', 'GGTAGCT', 'CTTAAGC', 'TCCATGGA'
idx = rng.integers(0, len(barcodes), size=1_000_000)
with tempfile.NamedTemporaryFile('w', suffix='.fastq', delete=False) as fh:
    for i in idx:
        r = pre + l_fl + barcodes[i] + r_fl + tail
        fh.write(f'@r\n{r}\n+\n{\"I\"*len(r)}\n')
    path = fh.name
for engine in ('device', 'sharded'):
    best = float('inf')
    for _ in range(2):
        t0 = time.time()
        doc, undoc, total, info = run_count(set(barcodes), path, engine=engine)
        best = min(best, time.time() - t0)
    exact = sum(doc.values()) == len(idx)
    print(engine, 'reads_per_s', round(total/best), 'exact', exact)
" > /tmp/r3_count.txt 2>&1

echo DONE > /tmp/r3_status.txt
