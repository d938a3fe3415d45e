import tempfile, time
import numpy as np
from barcoder_tpu.core.encode import decode
from barcoder_tpu.pipeline.heuristic_count import run_count

rng = np.random.default_rng(1)
barcodes = sorted({decode(rng.integers(0, 4, 20).astype(np.int8)) for _ in range(10_000)})
pre, l_fl, r_fl, tail = "ACGTG", "GGTAGCT", "CTTAAGC", "TCCATGGA"
idx = rng.integers(0, len(barcodes), size=1_000_000)
with tempfile.NamedTemporaryFile("w", suffix=".fastq", delete=False) as fh:
    for i in idx:
        r = pre + l_fl + barcodes[i] + r_fl + tail
        fh.write(f"@r\n{r}\n+\n{'I' * len(r)}\n")
    path = fh.name

for engine in ("vector", "native", "device"):
    try:
        run_count(set(barcodes), path, engine=engine)  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            doc, undoc, total, _ = run_count(set(barcodes), path, engine=engine)
            best = min(best, time.time() - t0)
        ok = sum(doc.values()) == len(idx)
        print(f"{engine}: {best:.2f}s -> {total/best/1e3:.0f}k reads/s exact={ok}")
    except Exception as e:
        print(f"{engine}: FAILED {type(e).__name__}: {e}")
