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
    """Yield lists of per-file numpy 'S' sequence arrays, co-indexed,
    chunk_size at a time.

    Reads ride the slab reader (native FASTQ parse) straight into
    fixed-width byte matrices viewed as null-padded 'S' strings — never
    materializing per-read Python strings (the reference's per-line reader
    loop, distillreads.py:47-87, was the measured hot spot here too).
    Null padding sorts below every base character, so lexicographic order
    over the padded rows equals Python string order. Like the reference's
    ``zip(*files)``, iteration stops at the shortest file."""
    from ..seqio.fast_reader import MatrixStream

    streams = [MatrixStream(fn) for fn in filenames]
    try:
        while True:
            batches = [s.next_records(chunk_size) for s in streams]
            if any(b is None for b in batches):
                break
            n = min(len(b[0]) for b in batches)
            if n == 0:
                break
            cols = []
            for mat, _lens in batches:
                mat = np.ascontiguousarray(mat[:n])
                w = max(mat.shape[1], 1)
                cols.append(mat.view(f"S{w}").ravel())
            yield cols
            if any(len(b[0]) > n for b in batches):
                break  # a shorter file ended mid-chunk: zip semantics
    finally:
        for s in streams:
            s.close()


def _sort_chunk(cols: list[np.ndarray]) -> list[np.ndarray]:
    """Sort co-indexed read tuples lexicographically (file order = key
    priority) via numpy byte-matrix lexsort."""
    arrays = [np.asarray(c, dtype="S") for c in cols]
    # np.lexsort sorts by the LAST key primarily
    order = np.lexsort(arrays[::-1])
    return [a[order] for a in arrays]


def _write_seq_array(fh, a: np.ndarray) -> None:
    """Write one sequence per line from an 'S' array without a per-row
    Python loop when rows are uniform width (the common case)."""
    n = len(a)
    if n == 0:
        return
    w = a.dtype.itemsize
    mat = a.view(np.uint8).reshape(n, w)
    if mat[:, -1].all():  # no null padding anywhere: uniform full-width rows
        out = np.empty((n, w + 1), np.uint8)
        out[:, :w] = mat
        out[:, w] = 10
        fh.write(out.tobytes())
    else:
        fh.write(b"\n".join(a.tolist()) + b"\n")  # tolist strips null padding


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

        if spilling:  # external k-way merge of sorted zstd runs
            writers = [zstd.open(out, "wt") for out in outputs]
            try:
                for row in heapq.merge(*(_iter_run(r) for r in runs)):
                    for fh, seq in zip(writers, row):
                        fh.write(seq + "\n")
            finally:
                for fh in writers:
                    fh.close()
        else:
            writers = [zstd.open(out, "wb") for out in outputs]
            try:
                if len(in_memory) <= 1:
                    arrays = in_memory[0] if in_memory else [np.array([], dtype="S1")] * len(filenames)
                else:
                    # merge fully in memory: concatenate columns, one global sort
                    cols = [
                        np.concatenate([run[i] for run in in_memory])
                        for i in range(len(filenames))
                    ]
                    order = np.lexsort(cols[::-1])
                    arrays = [a[order] for a in cols]
                for fh, a in zip(writers, arrays):
                    _write_seq_array(fh, a)
            finally:
                for fh in writers:
                    fh.close()
    info(f"wrote {', '.join(outputs)}")
    return outputs
