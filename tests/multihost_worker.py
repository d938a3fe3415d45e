"""Worker process for tests/test_multihost.py.

Joins a small multi-process CPU cluster (jax.distributed over a localhost
coordinator, N fake devices per process set by the parent via XLA_FLAGS),
then runs the UNCHANGED sharded engines over the process-spanning global
mesh and dumps the results as JSON for the parent to compare against its
own single-process 8-device run.

Usage: python tests/multihost_worker.py <process_id> <num_processes> <port> <out.json>
"""

import json
import sys


def main() -> None:
    pid, nproc, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    import jax

    # the axon plugin ignores env vars; force CPU like tests/conftest.py
    jax.config.update("jax_platforms", "cpu")
    from barcoder_tpu.parallel import multihost

    assert multihost.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc
    n_global = jax.device_count()

    import numpy as np

    from barcoder_tpu.core.genome import contig_from_record
    from barcoder_tpu.parallel.mesh import make_mesh
    from barcoder_tpu.parallel.sharded_scan import sharded_scan
    from tests.genomes import make_record, plant_guide, random_seq

    # the same deterministic scan case as tests/test_parallel.py
    # TestShardedScan.test_agreement — every process builds it identically
    rng = np.random.default_rng(0)
    rec = make_record(n=9000, topology="circular", seed=0)
    spacers = [random_seq(20, rng) for _ in range(5)]
    for i, s in enumerate(spacers):
        plant_guide(rec, s, 700 + 1500 * i, pam="TGG", strand="F" if i % 2 else "R")
    contig = contig_from_record(rec)

    mesh = make_mesh()  # spans ALL processes' devices
    assert mesh.devices.size == n_global
    res = {"process_index": jax.process_index(), "n_global_devices": n_global}
    for site_mode in ("auto", "never"):
        h = sharded_scan(
            spacers, contig, 1, pam="NGG", mesh=mesh, P=256, site_mode=site_mode
        )
        res[f"hits_{site_mode}"] = sorted(
            zip(h.spacer_idx.tolist(), h.pos.tolist(),
                h.strand.tolist(), h.mismatches.tolist())
        )

    # 2-D (library, genome) mesh with the LIBRARY axis crossing the process
    # boundary: each host holds different spacer rows (the TP analog over
    # DCN), genome tiles within each library row
    from barcoder_tpu.parallel.mesh import make_mesh_2d

    h = sharded_scan(
        spacers, contig, 2, pam="NGG", mesh=make_mesh_2d(2), P=256
    )
    res["hits_2d"] = sorted(
        zip(h.spacer_idx.tolist(), h.pos.tolist(),
            h.strand.tolist(), h.mismatches.tolist())
    )

    # the FULL targets pipeline (scan + locus join + postprocess) through
    # the sharded backend on the process-spanning mesh: plain SPMD — every
    # host computes the identical final table
    from barcoder_tpu.core.genome import Genome
    from barcoder_tpu.pipeline.targets import run_targets
    from barcoder_tpu.seqio.library import BarcodeLibrary

    lib = BarcodeLibrary.from_list(spacers)
    tr = run_targets(lib, Genome(contigs=[contig]), "NGG", 1, backend="sharded")
    res["targets_tsv_digest"] = __import__("hashlib").blake2b(
        tr.table.to_csv(sep="\t", index=False, na_rep="None").encode(),
        digest_size=12,
    ).hexdigest()

    # ShardedCounter over the global mesh: every process feeds the SAME
    # full chunk stream (plain SPMD — identical argv on each host); the
    # engine slices equal per-host row windows internally and the psum
    # leaves every host the whole-read-set documented counts
    from barcoder_tpu.parallel.sharded_count import ShardedCounter, make_read_mesh
    from barcoder_tpu.pipeline.heuristic_count import CountConfig
    from tests.test_heuristic_count import (
        L_FLANK, PREFIX, R_FLANK, make_barcodes, make_reads,
    )

    barcodes = make_barcodes(n=10, seed=2)
    # 777 is odd on purpose: the equal-width window padding path runs
    reads1, _, _truth = make_reads(barcodes, n_reads=777, seed=2)
    cfg = CountConfig(
        barcodes=set(barcodes), bc_len=20,
        L_fwd=L_FLANK, R_fwd=R_FLANK, L_rev=None, R_rev=None,
        L_fwd_start=len(PREFIX), L_rev_start=None, need_swap=False,
    )
    sc = ShardedCounter(cfg, mesh=make_read_mesh())
    sc.process_chunk((reads1, None))
    doc, undoc = sc.results()
    res["total_reads"] = sc.total_reads

    # paired-end: revcomp-consistency + both flank sides run through the
    # same per-host row slicing; undocumented barcodes planted so the
    # per-host undoc-window union is NOT vacuous
    from tests.genomes import random_seq as _rs
    from tests.test_heuristic_count import paired_cfg

    undoc_bc = [_rs(20, np.random.default_rng(77))]
    reads1p, reads2p, _t = make_reads(
        barcodes, n_reads=501, seed=3, undocumented=undoc_bc
    )
    scp = ShardedCounter(paired_cfg(barcodes), mesh=make_read_mesh())
    scp.process_chunk((reads1p, reads2p))
    doc_p, undoc_p = scp.results()
    res["counts_paired"] = sorted(doc_p.items())
    res["undoc_paired_local"] = sorted(undoc_p.items())
    res["counts"] = sorted(doc.items())
    res["undoc_local"] = sorted(undoc.items())

    # the FULL run_count driver (sampling + reader + chunk loop) with the
    # sharded engine: plain SPMD over the same FASTQ file — every host must
    # report the global counts/read total
    import os
    import tempfile

    from barcoder_tpu.pipeline.heuristic_count import run_count

    fq_dir = os.environ.get("MH_WORKER_TMP") or tempfile.gettempdir()
    fq = os.path.join(fq_dir, "mh_run_count.fastq")
    if pid == 0:  # one writer; content is deterministic either way
        pre, tail = "ACGTG", "TCCATGGA"
        with open(fq + ".tmp", "w") as fh:
            r = np.random.default_rng(6)
            for i in r.integers(0, len(barcodes), size=1500):
                rd = pre + L_FLANK + barcodes[i] + R_FLANK + tail
                fh.write(f"@r\n{rd}\n+\n{'I' * len(rd)}\n")
        os.replace(fq + ".tmp", fq)
    else:
        import time

        for _ in range(200):
            if os.path.exists(fq):
                break
            time.sleep(0.1)
    doc_rc, undoc_rc, total_rc, _info = run_count(
        set(barcodes), fq, engine="sharded"
    )
    res["run_count"] = sorted(doc_rc.items())
    res["run_count_total"] = total_rc
    res["run_count_undoc_local"] = sorted(undoc_rc.items())

    with open(out_path, "w") as fh:
        json.dump(res, fh)


if __name__ == "__main__":
    main()
