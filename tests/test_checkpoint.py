"""Checkpoint/resume for streaming barcode counting."""

import numpy as np

from barcoder_tpu.pipeline.heuristic_count import run_count

from .test_heuristic_count import make_barcodes, make_reads, write_reads


def test_checkpoint_resume_produces_same_counts(tmp_path):
    barcodes = make_barcodes(n=15)
    reads1, reads2, truth = make_reads(barcodes, n_reads=4000)
    f1, f2 = tmp_path / "r1.fastq", tmp_path / "r2.fastq"
    write_reads(f1, reads1)
    write_reads(f2, reads2)
    ckpt = str(tmp_path / "counts.ckpt.npz")

    # full run with checkpointing on: result identical to a plain run,
    # checkpoint removed at the end
    doc_a, undoc_a, total_a, _ = run_count(
        set(barcodes), str(f1), str(f2),
        chunk_size=256, checkpoint_path=ckpt, checkpoint_every=2,
    )
    doc_b, undoc_b, total_b, _ = run_count(set(barcodes), str(f1), str(f2), chunk_size=256)
    assert doc_a == doc_b and undoc_a == undoc_b and total_a == total_b
    import os

    assert not os.path.exists(ckpt)


def test_resume_from_partial_checkpoint(tmp_path, monkeypatch):
    import barcoder_tpu.pipeline.heuristic_count as hc

    barcodes = make_barcodes(n=15)
    reads1, reads2, truth = make_reads(barcodes, n_reads=4000)
    f1, f2 = tmp_path / "r1.fastq", tmp_path / "r2.fastq"
    write_reads(f1, reads1)
    write_reads(f2, reads2)
    ckpt = str(tmp_path / "counts.ckpt.npz")

    # simulate a crash: abort after a few chunks by wrapping process_matrices
    orig = hc.VectorCounter.process_matrices
    calls = {"n": 0}

    class Boom(Exception):
        pass

    def crashing(self, m1, m2):
        calls["n"] += 1
        if calls["n"] > 6:
            raise Boom()
        return orig(self, m1, m2)

    monkeypatch.setattr(hc.VectorCounter, "process_matrices", crashing)
    try:
        run_count(
            set(barcodes), str(f1), str(f2),
            chunk_size=256, checkpoint_path=ckpt, checkpoint_every=2,
        )
    except Boom:
        pass
    monkeypatch.setattr(hc.VectorCounter, "process_matrices", orig)
    import os

    assert os.path.exists(ckpt), "partial checkpoint should survive the crash"

    # resume: counts equal the uninterrupted run
    doc_a, undoc_a, total_a, _ = run_count(
        set(barcodes), str(f1), str(f2),
        chunk_size=256, checkpoint_path=ckpt, checkpoint_every=2,
    )
    doc_b, undoc_b, total_b, _ = run_count(set(barcodes), str(f1), str(f2), chunk_size=256)
    assert doc_a == doc_b and total_a == total_b
