"""Workload 5 — read preprocessing: sort + compress FASTQ into ``.reads.zst``.

Equivalent of the reference's ``distillreads.py``: N co-indexed FASTQ(.gz)
files become N ``.reads.zst`` files (one bare sequence per line), where the
tuples of co-indexed reads are globally sorted lexicographically (read1
primary, read2 tie-break, ...) — reference semantics from its
sort-chunks-then-k-way-merge process graph (distillreads.py:152-188 sorts
``zip(*files)`` tuples; :191-293 heap-merges the runs).

The reference runs a 5-stage multiprocess pipeline (readers → dispatch →
cpu/2 sorters → merger → writers) with zstd-compressed inter-process queues.
Here the same result comes from a single process: chunks are read with the
shared chunked reader, sorted as numpy byte matrices (C-speed lexsort), and
spilled as zstd temp runs that a streaming k-way merge concatenates — no
queues, locks, or the reference's commented-out deadlock workarounds
(distillreads.py:290-309).
"""

from __future__ import annotations

import heapq
import os
import tempfile

import numpy as np

try:
    import zstandard as zstd
except ImportError:  # pragma: no cover
    zstd = None


def get_output_filename(filename: str) -> str:
    """distillreads.py:334-340."""
    if filename.endswith(".fastq.gz"):
        return filename.replace(".fastq.gz", ".reads.zst")
    if filename.endswith(".fastq"):
        return filename.replace(".fastq", ".reads.zst")
    return filename + ".reads.zst"


def _iter_tuple_chunks(filenames: list[str], chunk_size: int):
    """Yield lists of per-file sequence lists, co-indexed, chunk_size at a
    time."""
    from ..seqio.fasta import iter_fastq, open_seq_file, strip_compression_ext

    handles = []
    iters = []
    for fn in filenames:
        stripped = strip_compression_ext(fn)
        fh = open_seq_file(fn)
        handles.append(fh)
        if stripped.endswith(".fastq") or stripped.endswith(".fq"):
            iters.append((seq for _, seq, _ in iter_fastq(fh)))
        else:
            iters.append((line.rstrip("\n") for line in fh))
    try:
        while True:
            cols = [[] for _ in filenames]
            done = False
            for _ in range(chunk_size):
                try:
                    row = [next(it) for it in iters]
                except StopIteration:
                    done = True
                    break
                for c, v in zip(cols, row):
                    c.append(v)
            if cols[0]:
                yield cols
            if done:
                break
    finally:
        for fh in handles:
            fh.close()


def _sort_chunk(cols: list[list[str]]) -> list[np.ndarray]:
    """Sort co-indexed read tuples lexicographically (file order = key
    priority) via numpy byte-matrix lexsort."""
    arrays = [np.array(c, dtype="S") for c in cols]
    # np.lexsort sorts by the LAST key primarily
    order = np.lexsort(arrays[::-1])
    return [a[order] for a in arrays]


def _write_run(arrays: list[np.ndarray], tmpdir: str, run_id: int) -> str:
    path = os.path.join(tmpdir, f"run{run_id}.zst")
    with zstd.open(path, "wt") as fh:
        n = len(arrays[0])
        for i in range(n):
            fh.write("\t".join(a[i].decode("ascii") for a in arrays) + "\n")
    return path


def _iter_run(path: str):
    with zstd.open(path, "rt") as fh:
        for line in fh:
            yield tuple(line.rstrip("\n").split("\t"))


def distill_reads(
    filenames: list[str],
    output_filenames: list[str] | None = None,
    chunk_size: int = 2**20,
    log=None,
) -> list[str]:
    """Sort + compress; returns the output paths."""
    if zstd is None:
        raise RuntimeError("zstandard module unavailable")
    if not filenames:
        raise ValueError("No input files")
    info = log.info if log else (lambda *_: None)
    outputs = output_filenames or [get_output_filename(fn) for fn in filenames]

    max_in_memory_chunks = 64
    with tempfile.TemporaryDirectory() as tmpdir:
        runs: list[str] = []
        in_memory: list[list[np.ndarray]] = []
        spilling = False
        for cols in _iter_tuple_chunks(filenames, chunk_size):
            arrays = _sort_chunk(cols)
            info(f"sorted a chunk: {len(arrays[0]):,} sequences")
            if not spilling and len(in_memory) >= max_in_memory_chunks:
                spilling = True
                for rid, a in enumerate(in_memory):
                    runs.append(_write_run(a, tmpdir, rid))
                in_memory = []
            if spilling:
                runs.append(_write_run(arrays, tmpdir, len(runs)))
            else:
                in_memory.append(arrays)

        writers = [zstd.open(out, "wt") for out in outputs]
        try:
            if spilling:  # external k-way merge of sorted zstd runs
                for row in heapq.merge(*(_iter_run(r) for r in runs)):
                    for fh, seq in zip(writers, row):
                        fh.write(seq + "\n")
            elif len(in_memory) <= 1:
                arrays = in_memory[0] if in_memory else [np.array([], dtype="S1")] * len(filenames)
                for fh, a in zip(writers, arrays):
                    for seq in a:
                        fh.write(seq.decode("ascii") + "\n")
            else:
                # merge fully in memory: concatenate columns, one global sort
                cols = [
                    np.concatenate([run[i] for run in in_memory])
                    for i in range(len(filenames))
                ]
                order = np.lexsort(cols[::-1])
                for fh, a in zip(writers, cols):
                    for seq in a[order]:
                        fh.write(seq.decode("ascii") + "\n")
        finally:
            for fh in writers:
                fh.close()
    info(f"wrote {', '.join(outputs)}")
    return outputs
