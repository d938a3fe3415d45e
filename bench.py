"""Benchmark driver entry — prints ONE JSON line.

Headline metric (BASELINE.json): genome-positions-scanned/s/chip at <=3
mismatches — spacer×position pairs scored per second, both strands, on the
E.-coli-scale config (4.6 Mb circular genome × ~10k 20-mer spacers, NGG
PAM). The reference publishes no numbers (BASELINE.md), so ``vs_baseline``
is reported against the per-chip bf16 matmul speed-of-light for this
formulation (2·K FLOPs per scored pair, K=128 → ~7.7e11 pairs/s on a v5e;
BASELINE.md's acceptance bar is 0.80 of SOL).

Runs the REAL end-to-end scan path (phase-1 Pallas block-max kernel, both
strands, PAM mask fused) — not a stripped kernel microbenchmark; phase-2
exact-hit extraction is measured but excluded from the headline rate (it is
hit-proportional, not genome-proportional).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

N_GENOME = 4_600_000
N_SPACERS = 9_984
L = 20
PAM = "NGG"
V = 3
P = 16384
SOL_PAIRS_PER_S = 7.7e11  # 197e12 bf16 FLOP/s / (2*128 FLOP per pair)


def build_config():
    from barcoder_tpu.core.encode import decode
    from barcoder_tpu.core.genome import Contig, Genome
    from barcoder_tpu.core.encode import encode

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=N_GENOME).astype(np.int8)
    seq = decode(codes)
    contig = Contig(
        id="BENCH0.1", length=N_GENOME, codes=encode(seq), seq=seq, topology="circular"
    )
    # library: genome-derived 20-mer windows at strided positions — every
    # spacer has a real perfect-match site (plus whatever near-miss sites
    # random sequence provides), giving a realistic hit structure; the PAM
    # filter then applies at scan time
    spacers = []
    step = N_GENOME // (N_SPACERS + 1)
    pos = 0
    while len(spacers) < N_SPACERS:
        pos = (pos + step) % (N_GENOME - L - 3)
        window = seq[pos : pos + L]
        spacers.append(window)
    return contig, spacers


def bench_kernel_phase(contig, spacers) -> dict:
    """Phase-1 kernel rate with dispatch pipelining (amortizes the dev
    tunnel's per-dispatch latency the way a multi-batch production run
    does)."""
    import jax.numpy as jnp

    from barcoder_tpu.ops import pallas_scan as ps

    L = len(spacers[0])
    K = 128
    halo = K // 4
    from barcoder_tpu.ops.prep import build_scan_array, spacer_matrix

    q_f = spacer_matrix(spacers)
    scan = build_scan_array(contig, L)
    S_pad = ps._geom_bucket(len(spacers), 512)  # matches BS_M below
    n_b = ps._geom_bucket(contig.length, P)
    scan_padded = np.full(n_b + halo, 4, dtype=np.int8)
    scan_padded[: len(scan)] = scan
    scan_dev = jnp.asarray(scan_padded)
    q_oh = np.zeros((S_pad, K), np.float32)
    q_oh[: len(spacers)] = ps.onehot_rows(q_f, K)
    if 4 * L < K:
        q_oh[:, 4 * L] = 1.0  # folded-bias column (see pallas_scan)
    q_dev = jnp.asarray(q_oh, dtype=jnp.bfloat16)
    shift_f, pat_f, _, _ = ps._pam_specs(PAM, "downstream", L)
    pat_arr = np.full(ps.MAX_PAM, 7, dtype=np.int8)
    pat_arr[: len(pat_f)] = pat_f
    SUB = P // 512
    BS_M = 512
    args = dict(n_starts=n_b, P=P, halo=halo, L=L, K=K, SUB=SUB, BS_M=BS_M,
                pair_cap=1 << 14, circular=True)
    shift_dev = jnp.int32(shift_f)
    pat_dev = jnp.asarray(pat_arr)
    thresh_dev = jnp.full((1,), L - V, jnp.float32)
    n_real = jnp.int32(contig.length)
    np.asarray(ps.phase1_full(scan_dev, n_real, q_dev, shift_dev, pat_dev, thresh_dev, **args)[0])  # warm
    REP = 8
    t0 = time.time()
    futs = [ps.phase1_full(scan_dev, n_real, q_dev, shift_dev, pat_dev, thresh_dev, **args) for _ in range(REP)]
    for f in futs:
        np.asarray(f[0])
    dt = (time.time() - t0) / REP
    rate = len(spacers) * contig.length / dt
    return {
        "phase1_s_per_strand_call": dt,
        "phase1_pairs_per_s": rate,
        "phase1_vs_bf16_sol": rate / SOL_PAIRS_PER_S,
    }


def bench_design_scale() -> dict:
    """Secondary metric: the design workload's all-vs-all off-target scan —
    every NGG-adjacent 20-mer of a 1 Mb circular genome mapped back against
    it at v=1 (reference: design_guides.py enumeration + subprocess
    targets.py). Dense-hit structure (every candidate hits its own site)
    exercises the pair-compaction + batched-extraction path."""
    from barcoder_tpu.core.encode import decode, encode
    from barcoder_tpu.core.genome import Contig, Genome
    from barcoder_tpu.pipeline.design import find_candidate_guides
    from barcoder_tpu.ops.pallas_scan import pallas_scan

    n = 1_000_000
    rng = np.random.default_rng(0)
    seq = decode(rng.integers(0, 4, size=n).astype(np.int8))
    contig = Contig(id="D.1", length=n, codes=encode(seq), seq=seq, topology="circular")
    cands = find_candidate_guides(Genome(contigs=[contig]), 20, "NGG")
    pallas_scan(cands, contig, 1, pam="NGG")  # warm
    dt = float("inf")
    for _ in range(2):
        t0 = time.time()
        hits = pallas_scan(cands, contig, 1, pam="NGG")
        dt = min(dt, time.time() - t0)
    return {
        "candidates": len(cands), "genome_bp": n, "hits": len(hits.pos),
        "design_scan_s": dt, "pairs_per_s": len(cands) * n * 2 / dt,
    }


def bench_design_full() -> dict:
    """The FULL design pipeline, driver-captured (VERDICT r4 item 3):
    E. coli-scale genome (4.6 Mb, 4,200 genes, wrapped gene) through
    enumerate → scan+targets → filter cascade, best-of-3 warm, with the
    per-phase split measured on a representative warm pass. Reference
    workload: design_guides.py:59-310 (enumeration + subprocess targets +
    pandas filters). Reproduces BASELINE's '5.1 s warm' design line in the
    driver JSON the way cn32_real did for targets in r4."""
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from genomes import make_record

    from barcoder_tpu.core.genome import Genome, contig_from_record
    from barcoder_tpu.pipeline.design import (
        DesignOptions,
        apply_design_filters,
        find_candidate_guides,
        run_design,
    )
    from barcoder_tpu.pipeline.targets import run_targets
    from barcoder_tpu.seqio.library import BarcodeLibrary

    rec = make_record(n=4_600_000, n_genes=4200, wrapped_gene=True, seed=5)
    genome = Genome(contigs=[contig_from_record(rec)])
    opts = DesignOptions(mismatches=1, omit_offtargets=True).resolve(20)
    run_design(genome, "NGG", 20, opts)  # warm: compiles + device caches
    best = float("inf")
    rows = n_cands = 0
    for _ in range(3):
        t0 = time.time()
        df, _tr, cands = run_design(genome, "NGG", 20, opts)
        best = min(best, time.time() - t0)
        rows, n_cands = len(df), len(cands)
    # phase split: one representative warm pass through the same stages
    t0 = time.time()
    cands = find_candidate_guides(genome, 20, "NGG")
    t_enum = time.time() - t0
    library = BarcodeLibrary.from_unique_list(cands)
    t0 = time.time()
    tr = run_targets(library, genome, "NGG", 1)
    t_scan = time.time() - t0
    t0 = time.time()
    apply_design_filters(tr.table, 20, opts)
    t_filter = time.time() - t0
    return {
        "genome_bp": 4_600_000, "genes": 4200, "candidates": n_cands,
        "rows": rows, "design_full_s": best,
        "phases": {"enumerate_s": round(t_enum, 3),
                   "scan_targets_s": round(t_scan, 3),
                   "filters_s": round(t_filter, 3)},
    }


def bench_cn32() -> dict:
    """The reference's OWN library shape (VERDICT r2 item 3): 9,984 32-nt
    spacers (CN-32-zmo.tsv scale) vs a 2 Mb circular genome (Zymomonas
    scale), NGNC, v=1. At L=32, 4L == K == 128: no spare G row, so no
    folded bias and no strand fusing — the site-compacted engine (forward
    rows only, PAM columns pre-enumerated) is the flagship at this shape
    and is forced here (site_mode='always') for a stable engine choice."""
    from barcoder_tpu.core.encode import decode, encode
    from barcoder_tpu.core.genome import Contig
    from barcoder_tpu.ops.pallas_scan import pallas_scan

    n = 2_000_000
    L32 = 32
    rng = np.random.default_rng(3)
    seq = decode(rng.integers(0, 4, size=n).astype(np.int8))
    contig = Contig(id="CN32.1", length=n, codes=encode(seq), seq=seq,
                    topology="circular")
    spacers = []
    step = n // (N_SPACERS + 1)
    pos = 0
    while len(spacers) < N_SPACERS:
        pos = (pos + step) % (n - L32 - 4)
        spacers.append(seq[pos : pos + L32])
    t0 = time.time()
    hits = pallas_scan(spacers, contig, 1, pam="NGNC", P=P, site_mode="always")
    first_s = time.time() - t0
    dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        hits = pallas_scan(spacers, contig, 1, pam="NGNC", P=P, site_mode="always")
        dt = min(dt, time.time() - t0)
    pairs = len(spacers) * n * 2
    return {"genome_bp": n, "spacers": len(spacers), "spacer_len": L32,
            "pam": "NGNC", "max_mismatches": 1, "hits": len(hits),
            "first_call_s": first_s, "end_to_end_s": dt,
            "pairs_per_s": pairs / dt}


def bench_cn32_real() -> dict:
    """The reference's OWN complete flagship workload end-to-end: the
    CN-32-zmo library vs the 4-contig Zymomonas SnapGene set, full pipeline
    (scan + locus join + aggregate to the 9.6k-row table), both backends.
    Gated on the reference data being present."""
    import os

    ref_lib = "/root/reference/Example_Libraries/CN-32-zmo.tsv"
    ref_gen = "/root/reference/GCA_003054575.1"
    if not (os.path.exists(ref_lib) and os.path.isdir(ref_gen)):
        return {"skipped": "reference data not present"}
    from barcoder_tpu.core.genome import Genome
    from barcoder_tpu.pipeline.targets import run_targets
    from barcoder_tpu.seqio.library import BarcodeLibrary

    lib = BarcodeLibrary.load(ref_lib, column="spacer")
    genome = Genome.load(ref_gen)
    out = {"contigs": len(genome.contigs), "spacers": len(lib.barcodes)}
    for backend in ("pallas", "sharded"):
        run_targets(lib, genome, "NGNC", 0, backend=backend)  # warm
        best = float("inf")
        rows = 0
        for _ in range(3):
            t0 = time.time()
            r = run_targets(lib, genome, "NGNC", 0, backend=backend)
            best = min(best, time.time() - t0)
            rows = len(r.table)
        out[f"{backend}_warm_s"] = best
        out["rows"] = rows
    return out


def bench_sharded_1dev(contig, spacers) -> dict:
    """The multi-chip engine on a 1-device mesh vs the same workload
    (VERDICT r2 item 1: per-device efficiency of the sharded path). After
    the r3 capacity-memo fix this is the FASTEST engine at bench shape —
    one fused shard_map program (phase 1 + device phase 2 + packed hit
    payload), one ~33 KB fetch."""
    from barcoder_tpu.parallel.mesh import make_mesh
    from barcoder_tpu.parallel.sharded_scan import sharded_scan, LAST_TIMINGS

    mesh = make_mesh(1)
    for _ in range(2):
        hits = sharded_scan(spacers, contig, V, pam=PAM, mesh=mesh, P=P)
    dt = float("inf")
    best_timings: dict = {}
    for _ in range(3):
        t0 = time.time()
        hits = sharded_scan(spacers, contig, V, pam=PAM, mesh=mesh, P=P)
        d = time.time() - t0
        if d < dt:  # snapshot the breakdown of the rep the headline reports
            dt = d
            best_timings = dict(LAST_TIMINGS)
    pairs = len(spacers) * contig.length * 2
    return {
        "end_to_end_s": dt, "hits": len(hits), "pairs_per_s": pairs / dt,
        "timings": {k: round(v, 5) if isinstance(v, float) else v
                    for k, v in best_timings.items()},
    }


def bench_serving(contig) -> dict:
    """Steady-state SERVING throughput: 8 DISTINCT 9,984-spacer libraries
    scanned back-to-back against the (site-table-cached) genome — the
    production pattern (many libraries, one genome) the per-library device
    caches were built for. Each new library pays only its own prep (codes
    ship + device one-hot build), ~13 ms over the repeat-scan floor."""
    from barcoder_tpu.ops.pallas_scan import pallas_scan

    n = contig.length
    seq = contig.seq

    def lib(seed, S=N_SPACERS, length=L):
        r = np.random.default_rng(seed)
        step = n // (S + 1)
        pos = 0
        out = []
        while len(out) < S:
            pos = (pos + step + int(r.integers(0, 7))) % (n - length - 3)
            out.append(seq[pos : pos + length])
        return out

    pallas_scan(lib(99), contig, V, pam=PAM, P=P)  # warm the engine shape
    libs = [lib(100 + i) for i in range(8)]
    t0 = time.time()
    hits = sum(len(pallas_scan(q, contig, V, pam=PAM, P=P)) for q in libs)
    dt = time.time() - t0
    pairs = 8 * N_SPACERS * n * 2

    # batched serving: every library's fused sharded program dispatched
    # before any fetch (sharded_scan_many) — device execution overlaps the
    # link round trips; measured 1.2-2x the sequential rate depending on
    # link state
    from barcoder_tpu.parallel.mesh import make_mesh
    from barcoder_tpu.parallel.sharded_scan import (
        serving_cache_stats,
        sharded_scan_many,
    )

    mesh = make_mesh(1)
    sharded_scan_many(libs, contig, V, pam=PAM, mesh=mesh, P=P,
                      max_pending=8)  # warm
    # warm-pass device-input cache discipline (VERDICT r4 item 4): the r4
    # FIFO thrash re-shipped ~21 MB per "warm" pass; these counters must
    # show all-hit / zero-byte warm serving
    serving_cache_stats(reset=True)
    dt_p = float("inf")
    for _ in range(2):
        t0 = time.time()
        rs = sharded_scan_many(libs, contig, V, pam=PAM, mesh=mesh, P=P,
                               max_pending=8)
        dt_p = min(dt_p, time.time() - t0)
    return {"libraries": 8, "total_s": dt, "s_per_library": dt / 8,
            "hits": hits, "pairs_per_s": pairs / dt,
            "pipelined_s_per_library": dt_p / 8,
            "pipelined_pairs_per_s": pairs / dt_p,
            "pipelined_hits": sum(len(r) for r in rs),
            "warm_cache": serving_cache_stats()}


def bench_counting() -> tuple[dict, str, list]:
    """Secondary metric (BASELINE config 4): barcodes matched/s on a
    1M-read simulated FASTQ against a 10k-barcode library (host engine).
    Returns (stats, fastq path, barcodes) so bench_distill reuses the file
    and bench_counting_device reuses the workload."""
    import tempfile

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
    dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        doc, undoc, total, _ = run_count(set(barcodes), path, engine="vector")
        dt = min(dt, time.time() - t0)
    exact = sum(doc.values()) == len(idx)
    return (
        {"reads": total, "count_s": dt, "reads_per_s": total / dt, "counts_exact": exact},
        path,
        barcodes,
    )


def bench_counting_device(barcodes, path: str) -> dict:
    """Accelerator counting engine on the same workload (VERDICT r3 item 4:
    the driver metric now reproduces the device-engine number, TPU-only —
    the caller gates on platform). On the tunneled link the documented
    floor is the per-dispatch RT + packed-core h2d (experiments/
    count_budget.py); on PCIe-attached chips that floor collapses."""
    from barcoder_tpu.pipeline.heuristic_count import run_count

    dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        doc, undoc, total, _ = run_count(set(barcodes), path, engine="device")
        dt = min(dt, time.time() - t0)
    return {"reads": total, "count_s": dt, "reads_per_s": total / dt,
            "counts_exact": sum(doc.values()) == total}


def bench_distill(fastq_path: str) -> dict:
    """Distill throughput (VERDICT r1 item 7): sort+zstd the 1M-read FASTQ
    into .reads.zst (byte-matrix sort + spill/merge path), reads/s.

    The counting FASTQ is best-case compressible (1M reads drawn from 10k
    barcodes zstd down to ~150 KB), so this is the UPPER bound."""
    import os
    import tempfile

    from barcoder_tpu.pipeline.distill import distill_reads

    out = os.path.join(tempfile.mkdtemp(prefix="bench_distill_"), "out.reads.zst")
    dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        distill_reads([fastq_path], [out])
        dt = min(dt, time.time() - t0)
    n_reads = 1_000_000
    size = os.path.getsize(out)
    os.remove(out)
    return {"reads": n_reads, "distill_s": dt, "reads_per_s": n_reads / dt,
            "output_bytes": size}


def bench_distill_random() -> dict:
    """Honest distill bound (VERDICT r2 item 7): 1M UNIQUE random 47-nt
    reads — incompressible payload, and a forced multi-run spill + k-way
    merge (chunk_size 2^18 → 4 sorted runs) so the merge path is inside the
    measured time, not just the in-memory fast path."""
    import os
    import tempfile

    from barcoder_tpu.core.encode import decode
    from barcoder_tpu.pipeline.distill import distill_reads

    rng = np.random.default_rng(2)
    n_reads = 1_000_000
    codes = rng.integers(0, 4, size=(n_reads, 47)).astype(np.int8)
    with tempfile.NamedTemporaryFile("w", suffix=".fastq", delete=False) as fh:
        q = "I" * 47
        for row in codes:
            fh.write(f"@r\n{decode(row)}\n+\n{q}\n")
        path = fh.name
    out = os.path.join(tempfile.mkdtemp(prefix="bench_distill_rnd_"), "out.reads.zst")
    dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        distill_reads([path], [out], chunk_size=2**18)
        dt = min(dt, time.time() - t0)
    size = os.path.getsize(out)
    os.remove(out)
    os.remove(path)
    return {"reads": n_reads, "distill_s": dt, "reads_per_s": n_reads / dt,
            "output_bytes": size, "spill_runs": n_reads // 2**18 + 1}


ATTACH_SOFT_S = 540  # pathological-attach detector: a quiet chip attaches
# in ~20 s, and a LEGITIMATE attach right after another TPU process exits
# is documented up to ~8 min (CLAUDE.md) — those must complete in attempt
# 1, so the threshold sits above them. r3's 1030 s attach is what this
# catches: abort (~9 min) + 180 s backoff + retry still leaves the second
# attempt >35 min of the 3300 s watchdog budget (the measurement itself
# runs ~6-8 min warm), where the old single attempt would have burnt a
# third of the budget waiting.


def main() -> int:
    """Watchdog wrapper: run the real benchmark in a subprocess so a wedged
    accelerator (observed: the tunneled dev chip can hang in d2h after an
    earlier client was killed) cannot hang the driver — on timeout/failure a
    reduced CPU-backend measurement is reported instead, flagged in detail.

    A pathological session attach (warmup matmul > ATTACH_SOFT_S; the
    server serializes session teardown of recently-exited clients) makes
    the inner process exit early; one backoff-and-retry follows, recorded
    as ``attach_retries`` in the result (VERDICT r3 item 6)."""
    import subprocess

    deadline = time.time() + 3300
    for attempt in range(2):
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--inner",
                 f"--attach-retries={attempt}"],
                # attach alone can cost 20+ min if another TPU process exited
                # recently (see CLAUDE.md); compiles are cache-hits after the
                # first round, so the budget is mostly attach headroom
                capture_output=True, text=True,
                timeout=max(120, deadline - time.time()),
            )
        except subprocess.TimeoutExpired:
            break
        attach_timeout = False
        for line in (proc.stdout or "").splitlines():
            if line.startswith("{"):
                try:
                    payload = json.loads(line)
                except ValueError:
                    continue  # stray brace-prefixed print, not a result
                if payload.get("attach_timeout"):
                    attach_timeout = True
                    break
                print(line)
                return 0
        if not attach_timeout:
            break  # real failure — no point retrying
        time.sleep(180)  # give the server time to finish session teardown
    return cpu_fallback()


def cpu_fallback() -> int:
    import os

    os.environ["BARCODER_TPU_BACKEND"] = "jax"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from barcoder_tpu.ops.ref_scan import jax_scan
    from barcoder_tpu.core.encode import decode, encode
    from barcoder_tpu.core.genome import Contig

    rng = np.random.default_rng(0)
    n = 400_000
    seq = decode(rng.integers(0, 4, size=n).astype(np.int8))
    contig = Contig(id="CPU0.1", length=n, codes=encode(seq), seq=seq, topology="circular")
    spacers = [seq[p : p + L] for p in range(100, 100 + 512 * 37, 37)][:512]
    jax_scan(spacers[:8], contig, V, pam=PAM)
    t0 = time.time()
    hits = jax_scan(spacers, contig, V, pam=PAM)
    dt = time.time() - t0
    pairs = len(spacers) * n * 2
    rate = pairs / dt
    counting, fastq_path, _barcodes = bench_counting()
    distill = bench_distill(fastq_path)
    os.remove(fastq_path)
    print(json.dumps({
        "metric": "genome-positions-scanned/s/chip",
        "value": rate,
        "unit": "spacer-positions/s",
        "vs_baseline": rate / SOL_PAIRS_PER_S,
        "detail": {
            "platform": "cpu-fallback (accelerator unavailable/wedged)",
            "genome_bp": n, "spacers": len(spacers), "hits": len(hits),
            "end_to_end_s": dt,
            "counting": counting,
            "distill": distill,
            "distill_random": bench_distill_random(),
        },
    }))
    return 0


def inner_main() -> int:
    attach_retries = 0
    for a in sys.argv:
        if a.startswith("--attach-retries="):
            attach_retries = int(a.split("=", 1)[1])
    import jax

    from barcoder_tpu.utils.profiling import compile_stats

    cs = compile_stats()  # listeners must register before the first jit

    from barcoder_tpu.ops.pallas_scan import pallas_scan

    platform = jax.devices()[0].platform
    contig, spacers = build_config()

    # the tunneled dev chip charges a fixed ~20 s session-attach cost to the
    # FIRST dispatched program, whatever it is (an 8x8 matmul pays the same)
    # — measure it separately so first_call_s isolates the framework's own
    # cold-start (compiles/cache loads/prep), not the link setup. A
    # pathological attach (> ATTACH_SOFT_S) aborts so the outer watchdog
    # can back off and retry instead of burning its whole budget.
    import os
    import threading

    import jax.numpy as jnp

    attach_box: dict = {}

    def _warmup():
        t0 = time.time()
        np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
        attach_box["attach_s"] = time.time() - t0

    th = threading.Thread(target=_warmup, daemon=True)
    th.start()
    th.join(timeout=ATTACH_SOFT_S)
    if "attach_s" not in attach_box:
        print(json.dumps({"attach_timeout": True}), flush=True)
        os._exit(7)  # the warmup thread is wedged in d2h; hard-exit
    attach_s = attach_box["attach_s"]

    pre = cs.snapshot()
    t0 = time.time()
    hits = pallas_scan(spacers, contig, V, pam=PAM, P=P)
    warm_s = time.time() - t0
    first_call_compiles = cs.delta(pre)

    # best of 3: single samples on the tunneled dev chip vary +-30%
    total_s = float("inf")
    for _ in range(3):
        t0 = time.time()
        hits = pallas_scan(spacers, contig, V, pam=PAM, P=P)
        total_s = min(total_s, time.time() - t0)

    kernel = bench_kernel_phase(contig, spacers)
    serving = bench_serving(contig)
    sharded_1dev = bench_sharded_1dev(contig, spacers)
    counting, fastq_path, barcodes = bench_counting()
    counting_device = (
        bench_counting_device(barcodes, fastq_path)
        if platform in ("tpu", "axon")
        else {"skipped": "accelerator engine is benched on TPU only"}
    )
    distill = bench_distill(fastq_path)
    distill_random = bench_distill_random()
    import os

    os.remove(fastq_path)
    design = bench_design_scale()
    design_full = (
        bench_design_full()
        if platform in ("tpu", "axon")
        else {"skipped": "full design pipeline is benched on TPU only"}
    )
    cn32 = bench_cn32()
    cn32_real = bench_cn32_real()

    pairs = len(spacers) * contig.length * 2  # both strands
    rate = pairs / total_s
    result = {
        "metric": "genome-positions-scanned/s/chip",
        "value": rate,
        "unit": "spacer-positions/s",
        "vs_baseline": rate / SOL_PAIRS_PER_S,
        "detail": {
            "platform": platform,
            "genome_bp": contig.length,
            "spacers": len(spacers),
            "spacer_len": L,
            "pam": PAM,
            "max_mismatches": V,
            "hits": len(hits),
            "end_to_end_s": total_s,
            "attach_s": attach_s,
            "first_call_s": warm_s,
            "first_call_compiles": first_call_compiles,
            "process_compiles": cs.snapshot(),
            "kernel": kernel,
            "serving": serving,
            "sharded_1dev": sharded_1dev,
            "counting": counting,
            "counting_device": counting_device,
            "distill": distill,
            "distill_random": distill_random,
            "design": design,
            "design_full": design_full,
            "cn32": cn32,
            "cn32_real": cn32_real,
            "loadavg": list(os.getloadavg()),
            "attach_retries": attach_retries,
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    if "--inner" in sys.argv:
        sys.exit(inner_main())
    sys.exit(main())
