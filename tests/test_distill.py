"""distill workload: sorted .reads.zst output equivalent to the reference's
sort-of-co-indexed-tuples semantics."""

import numpy as np
import pytest
import zstandard as zstd

from barcoder_tpu.pipeline.distill import distill_reads, get_output_filename
from barcoder_tpu.seqio.fasta import write_fastq

from .genomes import random_seq


def read_zst_lines(path):
    with zstd.open(path, "rt") as fh:
        return [line.rstrip("\n") for line in fh]


def make_distill_reads(n=1000, width=44, seed=8):
    """Deterministic paired read lists shared by the multi-host worker and
    its parent asserts (tests/multihost_worker.py)."""
    rng = np.random.default_rng(seed)
    r1 = [random_seq(width, rng) for _ in range(n)]
    r2 = [random_seq(width, rng) for _ in range(n)]
    return r1, r2


def test_output_filename_mapping():
    assert get_output_filename("a.fastq.gz") == "a.reads.zst"
    assert get_output_filename("a.fastq") == "a.reads.zst"
    assert get_output_filename("a.reads") == "a.reads.reads.zst"


def test_paired_sort(tmp_path):
    rng = np.random.default_rng(0)
    r1 = [random_seq(30, rng) for _ in range(500)]
    r2 = [random_seq(30, rng) for _ in range(500)]
    f1, f2 = tmp_path / "a.fastq", tmp_path / "b.fastq"
    write_fastq([(f"r{i}", s) for i, s in enumerate(r1)], f1, quality=30)
    write_fastq([(f"r{i}", s) for i, s in enumerate(r2)], f2, quality=30)
    outs = distill_reads([str(f1), str(f2)], chunk_size=128)
    got1 = read_zst_lines(outs[0])
    got2 = read_zst_lines(outs[1])
    want = sorted(zip(r1, r2))
    assert got1 == [a for a, _ in want]
    assert got2 == [b for _, b in want]


def test_single_file_gz(tmp_path):
    import gzip

    rng = np.random.default_rng(1)
    reads = [random_seq(25, rng) for _ in range(300)]
    f1 = tmp_path / "x.fastq.gz"
    with gzip.open(f1, "wt") as fh:
        write_fastq([(f"r{i}", s) for i, s in enumerate(reads)], fh, quality=30)
    outs = distill_reads([str(f1)], chunk_size=100)
    assert outs[0].endswith("x.reads.zst")
    assert read_zst_lines(outs[0]) == sorted(reads)


def test_reads_input_roundtrip(tmp_path):
    # .reads.zst output can itself be consumed by the counting reader
    from barcoder_tpu.seqio.fasta import iter_read_chunks

    rng = np.random.default_rng(2)
    reads = [random_seq(20, rng) for _ in range(50)]
    f1 = tmp_path / "y.fastq"
    write_fastq([(f"r{i}", s) for i, s in enumerate(reads)], f1, quality=30)
    outs = distill_reads([str(f1)])
    chunks = list(iter_read_chunks(outs[0], chunk_size=1000))
    assert chunks[0][0] == sorted(reads)


def test_external_merge_path(tmp_path, monkeypatch):
    # force the spill-to-runs path with a tiny in-memory cap
    import barcoder_tpu.pipeline.distill as distill_mod

    rng = np.random.default_rng(3)
    reads = [random_seq(15, rng) for _ in range(400)]
    f1 = tmp_path / "z.fastq"
    write_fastq([(f"r{i}", s) for i, s in enumerate(reads)], f1, quality=30)

    src = distill_mod.distill_reads.__globals__  # patch the constant via code path
    outs = distill_reads([str(f1)], chunk_size=3)  # 134 chunks > 64 → spill
    assert read_zst_lines(outs[0]) == sorted(reads)


def test_external_merge_paired_variable_widths(tmp_path):
    # spill path, paired-end, with read lengths that differ BETWEEN chunks:
    # runs carry different per-file widths and the merge must re-pad to the
    # global width without disturbing the combined-key sort order
    rng = np.random.default_rng(9)
    r1 = [random_seq(int(rng.integers(8, 20)), rng) for _ in range(300)]
    r2 = [random_seq(int(rng.integers(8, 20)), rng) for _ in range(300)]
    f1, f2 = tmp_path / "a.fastq", tmp_path / "b.fastq"
    write_fastq([(f"r{i}", s) for i, s in enumerate(r1)], f1, quality=30)
    write_fastq([(f"r{i}", s) for i, s in enumerate(r2)], f2, quality=30)
    outs = distill_reads([str(f1), str(f2)], chunk_size=4)  # 75 chunks → spill
    got1, got2 = read_zst_lines(outs[0]), read_zst_lines(outs[1])
    want = sorted(zip(r1, r2))
    assert list(zip(got1, got2)) == want


def _make_pair(tmp_path, n=600, seed=7):
    rng = np.random.default_rng(seed)
    r1 = [random_seq(28, rng) for _ in range(n)]
    r2 = [random_seq(28, rng) for _ in range(n)]
    f1, f2 = tmp_path / "c1.fastq", tmp_path / "c2.fastq"
    write_fastq([(f"r{i}", s) for i, s in enumerate(r1)], f1, quality=30)
    write_fastq([(f"r{i}", s) for i, s in enumerate(r2)], f2, quality=30)
    return r1, r2, str(f1), str(f2)


def test_checkpointed_run_matches_plain(tmp_path):
    r1, r2, f1, f2 = _make_pair(tmp_path)
    ckpt = tmp_path / "ckpt"
    outs = distill_reads(
        [f1, f2], [str(tmp_path / "o1.zst"), str(tmp_path / "o2.zst")],
        chunk_size=100, checkpoint_dir=str(ckpt),
    )
    want = sorted(zip(r1, r2))
    assert read_zst_lines(outs[0]) == [a for a, _ in want]
    assert read_zst_lines(outs[1]) == [b for _, b in want]
    # checkpoint cleaned up on success
    assert not (ckpt / "manifest.json").exists()
    assert not list(ckpt.glob("run*.zst"))


def test_checkpoint_crash_resume(tmp_path, monkeypatch):
    """Kill distill after several spilled chunks; the rerun must skip the
    already-sorted chunks (no re-sort) and emit byte-identical output."""
    import barcoder_tpu.pipeline.distill as distill_mod

    r1, r2, f1, f2 = _make_pair(tmp_path, n=1000, seed=9)
    ckpt = tmp_path / "ckpt"
    outs = [str(tmp_path / "o1.zst"), str(tmp_path / "o2.zst")]

    class Boom(Exception):
        pass

    orig_sort = distill_mod._sort_chunk
    calls = {"n": 0}

    def crashing(cols):
        calls["n"] += 1
        if calls["n"] > 4:
            raise Boom()
        return orig_sort(cols)

    monkeypatch.setattr(distill_mod, "_sort_chunk", crashing)
    with pytest.raises(Boom):
        distill_reads([f1, f2], outs, chunk_size=100, checkpoint_dir=str(ckpt))
    assert (ckpt / "manifest.json").exists()
    assert len(list(ckpt.glob("run*.zst"))) == 4

    # resume: chunks 0-3 must NOT be re-sorted (sort call counter proves it)
    calls_resume = {"n": 0}

    def counting(cols):
        calls_resume["n"] += 1
        return orig_sort(cols)

    monkeypatch.setattr(distill_mod, "_sort_chunk", counting)
    got = distill_reads([f1, f2], outs, chunk_size=100, checkpoint_dir=str(ckpt))
    assert calls_resume["n"] == 10 - 4
    want = sorted(zip(r1, r2))
    assert read_zst_lines(got[0]) == [a for a, _ in want]
    assert read_zst_lines(got[1]) == [b for _, b in want]
    assert not (ckpt / "manifest.json").exists()


def test_checkpoint_invalidated_on_input_change(tmp_path, monkeypatch):
    import barcoder_tpu.pipeline.distill as distill_mod

    r1, r2, f1, f2 = _make_pair(tmp_path, n=400, seed=11)
    ckpt = tmp_path / "ckpt"
    outs = [str(tmp_path / "o1.zst"), str(tmp_path / "o2.zst")]

    class Boom(Exception):
        pass

    orig_sort = distill_mod._sort_chunk
    calls = {"n": 0}

    def crashing(cols):
        calls["n"] += 1
        if calls["n"] > 2:
            raise Boom()
        return orig_sort(cols)

    monkeypatch.setattr(distill_mod, "_sort_chunk", crashing)
    with pytest.raises(Boom):
        distill_reads([f1, f2], outs, chunk_size=100, checkpoint_dir=str(ckpt))
    monkeypatch.setattr(distill_mod, "_sort_chunk", orig_sort)

    # rewrite input 1 with different content: stale runs must be discarded
    rng = np.random.default_rng(99)
    r1b = [random_seq(28, rng) for _ in range(400)]
    write_fastq([(f"r{i}", s) for i, s in enumerate(r1b)], f1, quality=30)
    got = distill_reads([f1, f2], outs, chunk_size=100, checkpoint_dir=str(ckpt))
    want = sorted(zip(r1b, r2))
    assert read_zst_lines(got[0]) == [a for a, _ in want]
    assert read_zst_lines(got[1]) == [b for _, b in want]
