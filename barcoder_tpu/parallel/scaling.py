"""Multi-device scaling-efficiency harness (SURVEY.md §7 step 6).

Measures the sharded phase-1 scan at mesh sizes 1..N on whatever devices are
present and reports throughput + efficiency vs the single-device run. On
real multi-chip hardware this is the ≥85%-scaling acceptance check
(BASELINE.md); on a fake-device CPU mesh the numbers only validate the
mechanics (the "devices" share one socket), which the report flags.

Run: ``python -m barcoder_tpu.parallel.scaling [n_bp] [n_spacers]``.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def measure_scaling(
    n_bp: int = 1 << 21,
    n_spacers: int = 1024,
    L: int = 20,
    P: int = 2048,
    repeats: int = 3,
    device_counts=None,
) -> dict:
    from ..core.encode import decode, encode
    from ..core.genome import Contig
    from ..ops.pallas_scan import BS, _cdiv, onehot_rows
    from ..ops.prep import build_scan_array, spacer_matrix
    from .mesh import make_mesh
    from .sharded_scan import sharded_scan_block_max

    devices = jax.devices()
    if device_counts is None:
        device_counts = sorted({1, 2, len(devices)} & set(range(1, len(devices) + 1)))
        device_counts = [d for d in device_counts if d <= len(devices)]

    rng = np.random.default_rng(0)
    seq = decode(rng.integers(0, 4, size=n_bp).astype(np.int8))
    contig = Contig(id="SCALE0.1", length=n_bp, codes=encode(seq), seq=seq, topology="circular")
    spacers = [seq[p : p + L] for p in range(64, 64 + n_spacers * 11, 11)][:n_spacers]
    K = max(_cdiv(4 * L, 128) * 128, 128)
    q_f = spacer_matrix(spacers)
    S_pad = max(_cdiv(len(spacers), BS) * BS, BS)
    q_oh = np.zeros((S_pad, K), dtype=np.float32)
    q_oh[: len(spacers)] = onehot_rows(q_f, K)
    q_dev = jnp.asarray(q_oh, dtype=jnp.bfloat16)
    scan = build_scan_array(contig, L).astype(np.int32)
    mask = np.ones(n_bp, dtype=np.int32)

    results = []
    base_rate = None
    for nd in device_counts:
        mesh = make_mesh(nd)
        # warm
        sharded_scan_block_max(q_dev, scan, mask, mesh, L=L, K=K, P=P)
        t0 = time.time()
        for _ in range(repeats):
            bm, totals = sharded_scan_block_max(q_dev, scan, mask, mesh, L=L, K=K, P=P)
        dt = (time.time() - t0) / repeats
        rate = len(spacers) * n_bp / dt
        if base_rate is None:
            base_rate = rate
        results.append(
            {
                "devices": nd,
                "seconds": dt,
                "spacer_positions_per_s": rate,
                "speedup": rate / base_rate,
                "efficiency": rate / (base_rate * nd),
            }
        )
    platform = devices[0].platform
    return {
        "platform": platform,
        "genome_bp": n_bp,
        "spacers": len(spacers),
        "fake_devices": platform == "cpu",
        "note": (
            "fake CPU devices share one socket — efficiency numbers are NOT "
            "meaningful, only the mechanics" if platform == "cpu" else
            "real accelerator mesh"
        ),
        "points": results,
    }


def main(argv=None) -> int:
    import sys

    args = list(sys.argv[1:] if argv is None else argv)
    n_bp = int(args[0]) if args else 1 << 21
    n_spacers = int(args[1]) if len(args) > 1 else 1024
    print(json.dumps(measure_scaling(n_bp=n_bp, n_spacers=n_spacers), indent=2))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
