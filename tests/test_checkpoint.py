"""Checkpoint/resume for streaming barcode counting — all three array
engines (vector / device / sharded) must resume losslessly; a checkpoint
taken while device futures are in flight must include their counts
(ckpt.save drains pending work first)."""

import os

import pytest

from barcoder_tpu.pipeline.heuristic_count import run_count

from .test_heuristic_count import make_barcodes, make_reads, write_reads

ENGINES = ["vector", "device", "sharded"]


@pytest.fixture(scope="module")
def read_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ckpt_reads")
    barcodes = make_barcodes(n=15)
    reads1, reads2, truth = make_reads(barcodes, n_reads=4000)
    f1, f2 = tmp / "r1.fastq", tmp / "r2.fastq"
    write_reads(f1, reads1)
    write_reads(f2, reads2)
    return barcodes, str(f1), str(f2)


@pytest.mark.parametrize("engine", ENGINES)
def test_checkpoint_resume_produces_same_counts(tmp_path, read_files, engine):
    barcodes, f1, f2 = read_files
    ckpt = str(tmp_path / "counts.ckpt.npz")

    # full run with checkpointing on: result identical to a plain run,
    # checkpoint removed at the end
    doc_a, undoc_a, total_a, _ = run_count(
        set(barcodes), f1, f2, chunk_size=256, engine=engine,
        checkpoint_path=ckpt, checkpoint_every=2,
    )
    doc_b, undoc_b, total_b, _ = run_count(set(barcodes), f1, f2, chunk_size=256)
    assert doc_a == doc_b and undoc_a == undoc_b and total_a == total_b
    assert not os.path.exists(ckpt)


@pytest.mark.parametrize("engine", ENGINES)
def test_resume_from_partial_checkpoint(tmp_path, monkeypatch, read_files, engine):
    """Crash mid-stream AFTER several checkpoints, resume, assert counts
    equal the uninterrupted run. With the device/sharded engines this is
    the case that used to lose counts: process_matrices had queued futures
    whose results weren't in doc_counts when save() ran."""
    import barcoder_tpu.pipeline.heuristic_count as hc

    barcodes, f1, f2 = read_files
    ckpt = str(tmp_path / "counts.ckpt.npz")

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
            set(barcodes), f1, f2, chunk_size=256, engine=engine,
            checkpoint_path=ckpt, checkpoint_every=2,
        )
    except Boom:
        pass
    monkeypatch.setattr(hc.VectorCounter, "process_matrices", orig)

    assert os.path.exists(ckpt), "partial checkpoint should survive the crash"

    # resume: counts equal the uninterrupted run (undoc too — the stale-
    # snapshot bug dropped whole chunks, which shows up in both counters)
    doc_a, undoc_a, total_a, _ = run_count(
        set(barcodes), f1, f2, chunk_size=256, engine=engine,
        checkpoint_path=ckpt, checkpoint_every=2,
    )
    doc_b, undoc_b, total_b, _ = run_count(set(barcodes), f1, f2, chunk_size=256)
    assert doc_a == doc_b and undoc_a == undoc_b and total_a == total_b


def test_pending_queue_is_bounded(read_files):
    """DeviceCounter must not retain every chunk's cores matrix until
    results() — the pipelining queue stays at <= _MAX_PENDING entries."""
    import numpy as np

    import barcoder_tpu.pipeline.heuristic_count as hc

    barcodes, f1, f2 = read_files
    # discover the config via a tiny run, then drive a DeviceCounter by hand
    _, _, _, info = run_count(set(barcodes), f1, f2, chunk_size=1024)
    vc = hc.DeviceCounter(info["config"])
    vc._DISPATCH_ROWS = 64  # flush every _tally so the queue actually fills
    rng = np.random.default_rng(0)
    max_seen = 0
    bc_len = info["config"].bc_len
    W = len(info["config"].L_fwd or "") + bc_len + len(info["config"].R_fwd or "")
    for _ in range(vc._MAX_PENDING * 3):
        cores = rng.integers(65, 69, size=(64, bc_len)).astype(np.uint8)
        vc._tally(np.zeros(64, np.uint64), cores, np.ones(64, bool))
        max_seen = max(max_seen, len(vc._pending))
    assert max_seen <= vc._MAX_PENDING
    vc.drain()
    assert vc._pending == []


def test_checkpoint_roundtrips_owned_reads(tmp_path, read_files):
    """Multi-host chunk-ownership bookkeeping survives a save/restore:
    without it a resumed sharded run under-reports this host's parse share
    and breaks the info['owned_reads'] contract (disjoint per-host shares
    sum to the stream total — asserted by tests/test_multihost.py and
    consumed by parallel/scaling.py's owned_covers_stream check)."""
    import barcoder_tpu.pipeline.heuristic_count as hc

    barcodes, f1, f2 = read_files
    _, _, _, info = run_count(set(barcodes), f1, f2, chunk_size=1024)
    cfg = info["config"]
    ckpt = hc._CheckpointState(str(tmp_path / "c.npz"), cfg)
    vc = hc.VectorCounter(cfg)
    vc.owned_reads = 123  # stand-in for ShardedCounter's attribute
    ckpt.save(vc, chunk_no=4)
    vc2 = hc.VectorCounter(cfg)
    vc2.owned_reads = 0
    assert ckpt.restore(vc2) == 4
    assert vc2.owned_reads == 123
    # counters without the attribute are untouched (single-host engines)
    vc3 = hc.VectorCounter(cfg)
    assert ckpt.restore(vc3) == 4
    assert not hasattr(vc3, "owned_reads")
