"""Slab-based FASTQ/.reads readers producing byte matrices.

The reference feeds its counting pool with per-line Python string lists
(heuristicount.py:100-153); at millions of reads the Python loop is the
bottleneck. Here files are read as large byte slabs, cut at record
boundaries with one vectorized newline scan, and parsed into fixed-width
uint8 matrices by the native seqpack library (numpy fallback built in) —
the representation the vectorized counting engine consumes directly.
"""

from __future__ import annotations

import numpy as np

from .. import native_bridge
from .fasta import detect_reads_format, open_seq_file

_SLAB = 8 << 20  # bytes per read() call


class MatrixStream:
    """Stream of (matrix uint8 (n, width), lengths int64) record batches.

    Newline positions are found ONCE per byte (a vectorized scan of each
    freshly-read slab, kept in an incrementally-consumed index array).
    The previous design re-ran ``np.nonzero`` over the whole remaining
    buffer on every cut, scanning each byte 2-3x — a top-3 cost of the
    1M-read counting pipeline and ~2/3 of the multi-host skip path (r5)."""

    def __init__(self, path: str):
        self.fmt = detect_reads_format(path)  # 'fastq' or 'reads'
        self.lines_per_record = 4 if self.fmt == "fastq" else 1
        self.fh = open_seq_file(path, "rb")
        self.buf = b""
        self.eof = False
        # newline offsets RELATIVE to buf[0], consumed in lockstep with buf
        self._nl_pos = np.zeros(0, np.int64)

    def close(self):
        self.fh.close()

    def _avail(self) -> int:
        return len(self._nl_pos)

    def _fill(self, want_records: int) -> None:
        need_newlines = want_records * self.lines_per_record + 1
        if self.eof or self._avail() >= need_newlines:
            return
        parts = [self.buf]
        new_pos = [self._nl_pos]
        avail = self._avail()
        end = len(self.buf)
        while not self.eof and avail < need_newlines:
            blob = self.fh.read(_SLAB)
            if not blob:
                self.eof = True
                break
            arr = np.frombuffer(blob, dtype=np.uint8)
            p = np.nonzero(arr == 10)[0] + end  # the ONE scan of these bytes
            new_pos.append(p)
            avail += len(p)
            parts.append(blob)
            end += len(blob)
        if len(parts) > 1:
            self.buf = b"".join(parts)
        self._nl_pos = (
            new_pos[0] if len(new_pos) == 1 else np.concatenate(new_pos)
        )

    def next_records(self, n: int):
        """Up to n records as (matrix, lengths); None at end of stream."""
        chunk_take = self._cut_records(n)
        if chunk_take is None:
            return None
        chunk, take, cnl = chunk_take

        # row width = longest sequence line in the chunk (line boundaries
        # come from the cached newline index — no rescan)
        starts = np.concatenate(([0], cnl + 1))
        ends = np.concatenate((cnl, [len(chunk)]))
        line_lens = ends - starts[: len(ends)]
        if self.fmt == "fastq":
            seq_lens = line_lens[1::4]
        else:
            seq_lens = line_lens
        width = int(seq_lens.max()) if len(seq_lens) else 1
        width = max(width, 1)
        if self.fmt == "fastq":
            mat, lens = native_bridge.parse_fastq_buffer(chunk, width, take)
        else:
            mat, lens = native_bridge.parse_reads_buffer(chunk, width, take)
        return mat, lens

    def skip_records(self, n: int):
        """Consume up to n records WITHOUT parsing them into a matrix;
        returns the record count (None at end of stream). The multi-host
        chunk-ownership reader uses this so a host scans (one memchr-speed
        newline pass) the chunks it does not own instead of paying the
        full matrix parse for rows it would discard. The count matches
        what ``next_records`` would have returned for the SAME chunk —
        the lockstep invariant multi-host scheduling is built on (blank
        ``.reads`` lines are not records; a truncated final FASTQ record
        is)."""
        chunk_take = self._cut_records(n, count_only=True)
        if chunk_take is None:
            return None
        return chunk_take[1]

    def _line_spans(self, consumed: int, cut: int):
        """(starts, ends) of the lines inside the next cut: ``consumed``
        newline-terminated lines plus the unterminated tail line when the
        cut runs past the last newline."""
        cnl = self._nl_pos[:consumed]
        starts = np.concatenate(([0], cnl + 1))
        ends = np.concatenate((cnl, [cut]))
        if len(starts) and starts[-1] >= cut:
            starts, ends = starts[:-1], ends[:-1]
        return starts, ends

    def _nonblank_lines(self, starts, ends) -> int:
        """Lines that are records for the ``.reads`` parsers: non-empty
        after CR-strip (native/sp_parse_reads semantics)."""
        lens = ends - starts
        arr = np.frombuffer(self.buf, dtype=np.uint8)  # zero-copy view
        cr_only = (lens == 1) & (arr[np.clip(starts, 0, len(arr) - 1)] == 13)
        return int(((lens > 0) & ~cr_only).sum())

    def _cut_records(self, n: int, count_only: bool = False):
        """Consume up to n records; returns (raw chunk bytes, record
        count, chunk-relative newline offsets) or None at end of stream.
        With count_only=True the chunk/offsets are not materialized
        (None, count, None) — the skip path's byte copies were a large
        share of its cost.

        End-of-stream semantics match the parsers and the reference's
        readline loop: trailing blank lines are not records, and a
        truncated final FASTQ record (missing +/quality lines) IS one.
        Blank lines in the MIDDLE of a FASTQ file are out of scope (no
        FASTQ writer emits them; the 4-line structural model cuts on
        line counts)."""
        self._fill(n)
        if not self.buf:
            return None
        lpr = self.lines_per_record
        avail = self._avail()
        last_nl_end = int(self._nl_pos[-1]) + 1 if avail else 0
        if self.eof:
            total_lines = avail + (1 if len(self.buf) > last_nl_end else 0)
            # trim trailing blank lines (a final "\n" or "\r\n" run)
            starts, ends = self._line_spans(avail, len(self.buf))
            arr = np.frombuffer(self.buf, dtype=np.uint8)
            while total_lines:
                s, e = int(starts[total_lines - 1]), int(ends[total_lines - 1])
                if e > s and not (e - s == 1 and arr[s] == 13):
                    break
                total_lines -= 1
            # ceil: a truncated final record still counts (reference
            # readline semantics, heuristicount.py:100-153; the native
            # FASTQ parser keeps it too)
            n_records = -(-total_lines // lpr)
        else:
            n_records = avail // lpr
        take = min(n, n_records)
        if take == 0:
            if self.eof:
                self.buf = b""
                self._nl_pos = np.zeros(0, np.int64)
                return None
            return None
        if self.eof and take == n_records:
            cut = len(self.buf)
            consumed = avail
        else:
            cut = int(self._nl_pos[take * lpr - 1]) + 1
            consumed = take * lpr
        if self.fmt == "reads":
            # the parsers drop blank lines: report what they will return
            count = self._nonblank_lines(*self._line_spans(consumed, cut))
        else:
            count = take
        if count_only:
            chunk, cnl = None, None
            self.buf = self.buf[cut:]
        else:
            cnl = self._nl_pos[:consumed].copy()
            chunk, self.buf = self.buf[:cut], self.buf[cut:]
        # rebase the (small) remaining index: int64 offsets are 8x fewer
        # bytes than the buffer rescans this replaces
        self._nl_pos = self._nl_pos[consumed:] - cut
        return chunk, count, cnl


def iter_owned_matrix_chunks(
    file1: str,
    file2: str | None = None,
    chunk_size: int = 2**16,
    owner: int = 0,
    num_owners: int = 1,
    start_chunk: int = 0,
):
    """Chunk-ownership reader for multi-host counting: yields
    ``(chunk_idx, n_records, r1, r2)`` for EVERY chunk of the stream, but
    parses matrices only for chunks this process owns
    (``chunk_idx % num_owners == owner``); unowned chunks (and chunks below
    ``start_chunk`` — the checkpoint-resume skip) yield
    ``(chunk_idx, n, None, None)`` after a cheap byte-level skip.

    Every process scans the same files with the same geometry, so all
    processes observe the identical ``(chunk_idx, n_records)`` stream —
    the shared knowledge the lockstep sharded-counting dispatch schedule
    is derived from. This is the multi-host generalization of the
    reference's fork pool DIVIDING parse work across workers
    (heuristicount.py:720-722) instead of replicating it: N hosts each
    pay 1/N of the matrix-parse cost.
    """
    s1 = MatrixStream(file1)
    s2 = None
    try:
        s2 = MatrixStream(file2) if file2 else None
        chunk_idx = 0
        while True:
            mine = chunk_idx >= start_chunk and chunk_idx % num_owners == owner
            if mine:
                r1 = s1.next_records(chunk_size)
                if r1 is None:
                    break
                n1 = len(r1[1])
            else:
                n1 = s1.skip_records(chunk_size)
                if n1 is None:
                    break
                r1 = None
            r2 = None
            if s2 is not None:
                if mine:
                    r2 = s2.next_records(n1)
                    n2 = None if r2 is None else len(r2[1])
                else:
                    n2 = s2.skip_records(n1)
                if n2 != n1:
                    raise ValueError(
                        "Length of reads1 and reads2 must be the same for paired-end data."
                    )
            yield chunk_idx, n1, r1, r2
            chunk_idx += 1
    finally:
        s1.close()
        if s2:
            s2.close()


def iter_matrix_chunks(file1: str, file2: str | None = None, chunk_size: int = 2**16):
    """Yield ((mat1, lens1), (mat2, lens2) | None) batches of co-indexed
    records; the final batch may be short.

    Delegates to the ownership iterator with a single owner so the chunk
    schedule has exactly ONE definition — multi-host byte-identical output
    depends on the single- and multi-process paths never cutting chunks
    differently."""
    for _idx, _n, r1, r2 in iter_owned_matrix_chunks(
        file1, file2, chunk_size, owner=0, num_owners=1
    ):
        yield r1, r2
