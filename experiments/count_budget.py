"""Per-phase budget for the accelerator counting engines on the tunneled
TPU link (VERDICT r3 item 2): measured wall vs the sum of link costs.

Builds the bench counting workload (1M reads / 10k barcodes), runs the
host vector engine and the device/sharded engines, and prints a budget
table: n_dispatches x link RT + h2d bytes / measured h2d rate + fetch
count x RT vs measured wall. Run on the TPU (one process at a time):

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/count_budget.py
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LINK_RT_S = 0.026  # measured dispatch round trip (CLAUDE.md)
H2D_MBPS = 32.0  # steady h2d (CLAUDE.md)


def build_workload():
    from barcoder_tpu.core.encode import decode

    rng = np.random.default_rng(1)
    barcodes = sorted(
        {decode(rng.integers(0, 4, 20).astype(np.int8)) for _ in range(10_000)}
    )
    pre, l_fl, r_fl, tail = "ACGTG", "GGTAGCT", "CTTAAGC", "TCCATGGA"
    idx = rng.integers(0, len(barcodes), size=1_000_000)
    fh = tempfile.NamedTemporaryFile("w", suffix=".fastq", delete=False)
    for i in idx:
        r = pre + l_fl + barcodes[i] + r_fl + tail
        fh.write(f"@r\n{r}\n+\n{'I' * len(r)}\n")
    fh.close()
    return barcodes, fh.name, len(idx)


def time_engine(barcodes, path, engine, reps=3):
    from barcoder_tpu.pipeline.heuristic_count import run_count

    best = float("inf")
    doc = None
    for _ in range(reps):
        t0 = time.time()
        doc, undoc, total, info = run_count(set(barcodes), path, engine=engine)
        best = min(best, time.time() - t0)
    return best, doc, total


def main() -> None:
    import jax

    platform = jax.devices()[0].platform
    print(f"platform: {platform}", flush=True)
    barcodes, path, n_reads = build_workload()
    print(f"workload: {n_reads:,} reads x {len(barcodes):,} barcodes", flush=True)

    # warm attach with a tiny dispatch so engine timings exclude it
    import jax.numpy as jnp

    t0 = time.time()
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    print(f"attach_s: {time.time() - t0:.1f}", flush=True)

    results = {}
    for engine in ("vector", "device", "sharded"):
        t, doc, total = time_engine(barcodes, path, engine)
        exact = sum(doc.values()) == n_reads
        results[engine] = t
        print(
            f"{engine:8s} best-of-3: {t:6.2f} s  {total / t:10,.0f} reads/s"
            f"  exact={exact}",
            flush=True,
        )

    # budget for the device engine at the current batching geometry
    from barcoder_tpu.pipeline.heuristic_count import DeviceCounter

    rows = DeviceCounter._DISPATCH_ROWS
    n_disp = -(-n_reads // rows)
    h2d_bytes = n_reads * 9  # 8 B packed core + 1 B eligibility per read
    bits_bytes = n_disp * (rows // 8)
    budget = (
        n_disp * LINK_RT_S  # dispatch RTs (pipelined upper bound)
        + h2d_bytes / (H2D_MBPS * 1e6)  # packed-core ship
        + n_disp * LINK_RT_S  # matched-bit fetches at drain
        + LINK_RT_S  # one accumulator fetch
    )
    host_floor = results.get("vector")
    print(
        f"\nbudget (device): {n_disp} dispatches x {LINK_RT_S * 1e3:.0f} ms"
        f" + {h2d_bytes / 1e6:.1f} MB h2d / {H2D_MBPS:.0f} MB/s"
        f" + {n_disp} bit-fetches ({bits_bytes / 1e3:.0f} KB) + 1 acc fetch"
        f" = {budget:.2f} s link floor",
        flush=True,
    )
    print(
        f"measured device wall {results['device']:.2f} s -> link floor is"
        f" {100 * budget / results['device']:.0f}% of wall"
        f" (host vector engine: {host_floor:.2f} s)",
        flush=True,
    )
    os.remove(path)


if __name__ == "__main__":
    main()
