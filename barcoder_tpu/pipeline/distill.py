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

import json
import os
import struct
import tempfile

import numpy as np

try:
    import zstandard as zstd
except ImportError:  # pragma: no cover
    zstd = None


def _zstd_writer(path: str):
    """zstd write handle with MULTITHREADED frame compression: the worker
    threads release the GIL, so compression overlaps the Python-side matrix
    assembly — measured 107→222 MB/s on this 2-core host (zstd is the
    distill bound; the reference gets its overlap from a 5-process graph,
    distillreads.py:350-433). Output frames stay standard zstd."""
    return zstd.open(
        path, "wb",
        cctx=zstd.ZstdCompressor(level=3, threads=max(os.cpu_count() or 1, 1)),
    )


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
    ``zip(*files)``, iteration stops at the shortest file.

    Delegates to the ownership iterator with one owner: the chunk schedule
    must have exactly ONE definition, or the multi-host byte-identical
    output contract silently breaks when the copies diverge."""
    for _no, cols in _iter_tuple_chunks_owned(filenames, chunk_size, 0, 1):
        yield cols


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


class _Run:
    """One sorted spill run as a zstd-compressed fixed-width byte matrix.

    Rows are the CONCATENATED null-padded per-file sequences; null padding
    sorts below every base, so byte order of the combined row equals the
    reference's (read1, read2, ...) tuple sort order — the same invariant
    the in-memory lexsort path relies on. Layout: a 16-byte header
    (n_rows, n_files) + n_files u64 widths, then the raw row bytes,
    zstd-streamed. No per-line Python anywhere: the writer is one
    ``tobytes`` and the reader slices whole row blocks."""

    HEADER = struct.Struct("<QQ")

    @staticmethod
    def write(
        arrays: list[np.ndarray], tmpdir: str, run_id: int,
        name: str | None = None,
    ) -> "_Run":
        path = os.path.join(tmpdir, name or f"run{run_id}.zst")
        n = len(arrays[0])
        widths = [a.dtype.itemsize for a in arrays]
        with _zstd_writer(path) as fh:
            fh.write(_Run.HEADER.pack(n, len(arrays)))
            fh.write(struct.pack(f"<{len(arrays)}Q", *widths))
            combined = np.empty((n, sum(widths)), np.uint8)
            col = 0
            for a, w in zip(arrays, widths):
                combined[:, col : col + w] = a.view(np.uint8).reshape(n, w)
                col += w
            fh.write(combined.tobytes())
        return _Run(path, n, widths)

    def __init__(self, path: str, n: int, widths: list[int]):
        self.path = path
        self.n = n
        self.widths = widths
        self.remaining = n
        self._fh = None

    def open(self, global_widths: list[int]) -> None:
        self._fh = zstd.open(self.path, "rb")
        self._fh.read(self.HEADER.size + 8 * len(self.widths))  # skip header
        self.global_widths = global_widths

    def next_block(self, rows: int) -> np.ndarray | None:
        """Next <= rows rows, re-padded to the GLOBAL per-file widths (read
        lengths can differ between chunks) and viewed as one 'S' column."""
        if self.remaining == 0:
            return None
        take = min(rows, self.remaining)
        w_run = sum(self.widths)
        raw = self._fh.read(take * w_run)
        self.remaining -= take
        mat = np.frombuffer(raw, np.uint8).reshape(take, w_run)
        W = sum(self.global_widths)
        if self.global_widths == self.widths:
            out = np.ascontiguousarray(mat)
        else:
            out = np.zeros((take, W), np.uint8)
            src = dst = 0
            for w_r, w_g in zip(self.widths, self.global_widths):
                out[:, dst : dst + w_r] = mat[:, src : src + w_r]
                src += w_r
                dst += w_g
        return out.view(f"S{W}").ravel()

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()


def _merge_runs(runs: list[_Run], block_rows: int = 1 << 16):
    """Streaming k-way merge of sorted byte-matrix runs, vectorized.

    Cut-point batching instead of a per-row heap: each round takes the
    minimum over runs of each run's current block maximum, emits every
    buffered row <= that cut (any still-unread row of any run is >= its
    block max >= the cut, so the emitted batch is globally final), and
    np.sort's the batch — C-speed comparisons on 'S' rows, no Python
    tuples (the heapq.merge path this replaces walked a Python generator
    per row). Memory: k blocks + one batch. Yields sorted 'S' batches."""
    global_widths = [max(r.widths[i] for r in runs) for i in range(len(runs[0].widths))]
    for r in runs:
        r.open(global_widths)
    bufs = [r.next_block(block_rows) for r in runs]
    live = [i for i, b in enumerate(bufs) if b is not None and len(b)]
    while live:
        cut = min(bufs[i][-1] for i in live)
        parts = []
        next_live = []
        for i in live:
            b = bufs[i]
            hi = np.searchsorted(b, cut, side="right")
            if hi:
                parts.append(b[:hi])
            rest = b[hi:]
            if len(rest) == 0:
                nb = runs[i].next_block(block_rows)
                if nb is not None and len(nb):
                    bufs[i] = nb
                    next_live.append(i)
            else:
                bufs[i] = rest
                next_live.append(i)
        live = next_live
        batch = parts[0] if len(parts) == 1 else np.sort(np.concatenate(parts))
        yield batch, global_widths
    for r in runs:
        r.close()


class _DistillCheckpoint:
    """Crash-safe resume for distill: sorted spill runs persist in a user
    directory with a manifest recording how many input chunks they cover.

    The expensive work (read + lexsort + zstd run compression — zstd is the
    measured bound on this host) is durable per chunk; a rerun with the same
    inputs skips straight past the chunks already spilled (read-and-discard,
    no sort/compress) and continues. The reference has no equivalent — a
    killed distillreads.py run recomputes everything (SURVEY.md §5
    "Checkpoint / resume: none"); this must be strictly better.

    Manifest invalidation is by input fingerprint (path, size, mtime_ns) +
    chunk size + outputs: any change restarts from scratch."""

    VERSION = 1

    def __init__(self, directory: str, fingerprint: dict, info):
        self.dir = directory
        self.fingerprint = fingerprint
        self.manifest_path = os.path.join(directory, "manifest.json")
        self.chunks_done = 0
        self.input_exhausted = False
        self.runs: list[_Run] = []
        os.makedirs(directory, exist_ok=True)
        state = None
        if os.path.exists(self.manifest_path):
            try:
                with open(self.manifest_path) as fh:
                    state = json.load(fh)
            except (OSError, ValueError):
                state = None
        if (
            state
            and state.get("version") == self.VERSION
            and state.get("fingerprint") == fingerprint
            and all(os.path.exists(os.path.join(directory, r[0])) for r in state["runs"])
        ):
            self.chunks_done = state["chunks_done"]
            self.input_exhausted = state["input_exhausted"]
            self.runs = [
                _Run(os.path.join(directory, rel), n, widths)
                for rel, n, widths in state["runs"]
            ]
            info(
                f"resuming distill from checkpoint: {self.chunks_done:,} "
                f"chunk(s) already sorted"
            )
        elif state is not None:
            info("distill checkpoint does not match inputs; starting fresh")
            # delete only the run files the stale manifest owns — the user
            # may have pointed --checkpoint at a non-empty directory whose
            # other run*.zst files are not ours to destroy
            self._clear_runs([r[0] for r in state.get("runs", [])])

    @staticmethod
    def make_fingerprint(filenames, outputs, chunk_size) -> dict:
        files = []
        for fn in filenames:
            st = os.stat(fn)
            files.append([os.path.abspath(fn), st.st_size, st.st_mtime_ns])
        return {"files": files, "outputs": list(outputs), "chunk_size": chunk_size}

    def _clear_runs(self, names: list[str]) -> None:
        for name in names:
            path = os.path.join(self.dir, os.path.basename(name))
            if os.path.exists(path):
                os.unlink(path)

    def save(self) -> None:
        state = {
            "version": self.VERSION,
            "fingerprint": self.fingerprint,
            "chunks_done": self.chunks_done,
            "input_exhausted": self.input_exhausted,
            "runs": [[os.path.basename(r.path), r.n, r.widths] for r in self.runs],
        }
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(state, fh)
        os.replace(tmp, self.manifest_path)  # atomic on POSIX

    def add_run(self, run: _Run) -> None:
        self.runs.append(run)
        self.chunks_done += 1
        self.save()

    def cleanup(self) -> None:
        self._clear_runs([os.path.basename(r.path) for r in self.runs])
        if os.path.exists(self.manifest_path):
            os.unlink(self.manifest_path)


def distill_reads(
    filenames: list[str],
    output_filenames: list[str] | None = None,
    chunk_size: int = 2**20,
    log=None,
    checkpoint_dir: str | None = None,
) -> list[str]:
    """Sort + compress; returns the output paths.

    checkpoint_dir enables crash-safe resume: every sorted chunk is spilled
    there as a durable zstd run and a rerun continues from the last one
    (see _DistillCheckpoint).

    Multi-host (``jax.process_count() > 1`` after the CLI's cluster join):
    with a checkpoint_dir on a SHARED filesystem, the sort+compress phase —
    the measured bound — is divided across hosts by chunk ownership
    (chunk i → host i mod K; unowned chunks skip at newline-scan speed) and
    host 0 runs the final k-way merge (see _distill_multihost). Without a
    checkpoint_dir, host 0 distills alone while the others wait — identical
    output either way, never a write race."""
    if zstd is None:
        raise RuntimeError("zstandard module unavailable")
    if not filenames:
        raise ValueError("No input files")
    info = log.info if log else (lambda *_: None)
    outputs = output_filenames or [get_output_filename(fn) for fn in filenames]

    import sys as _sys

    if "jax" in _sys.modules:  # only probe a runtime someone already started
        import jax

        if jax.process_count() > 1:
            return _distill_multihost(
                filenames, outputs, chunk_size, checkpoint_dir, info
            )

    return _distill_local(filenames, outputs, chunk_size, checkpoint_dir, info)


def _merge_to_outputs(runs: list[_Run], outputs: list[str]) -> None:
    """Stream the k-way merge of sorted runs into the per-file output
    writers (no runs → empty outputs, still created)."""
    writers = [_zstd_writer(out) for out in outputs]
    try:
        if runs:
            for batch, widths in _merge_runs(runs):
                n = len(batch)
                mat = batch.view(np.uint8).reshape(n, sum(widths))
                col = 0
                for fh, w in zip(writers, widths):
                    _write_seq_array(fh, np.ascontiguousarray(
                        mat[:, col : col + w]).view(f"S{w}").ravel())
                    col += w
    finally:
        for fh in writers:
            fh.close()


def _distill_local(
    filenames: list[str],
    outputs: list[str],
    chunk_size: int,
    checkpoint_dir: str | None,
    info,
) -> list[str]:
    """The single-process distill body."""
    if checkpoint_dir:
        return _distill_checkpointed(
            filenames, outputs, chunk_size, checkpoint_dir, info
        )

    # spill when EITHER trigger fires: the chunk-count cap alone held
    # ~10-20 GB of sorted matrices at the default 2^20-read chunk size on
    # 150 bp paired reads (r5 review) — an OOM before the external sort
    # ever engaged; the byte cap bounds that while tiny-chunk workloads
    # keep the old count behavior
    max_in_memory_chunks = 64
    max_in_memory_bytes = 2 << 30
    with tempfile.TemporaryDirectory() as tmpdir:
        runs: list[_Run] = []
        in_memory: list[list[np.ndarray]] = []
        in_memory_bytes = 0
        spilling = False
        for cols in _iter_tuple_chunks(filenames, chunk_size):
            arrays = _sort_chunk(cols)
            info(f"sorted a chunk: {len(arrays[0]):,} sequences")
            if not spilling and (
                len(in_memory) >= max_in_memory_chunks
                or in_memory_bytes >= max_in_memory_bytes
            ):
                spilling = True
                for rid, a in enumerate(in_memory):
                    runs.append(_Run.write(a, tmpdir, rid))
                in_memory = []
            if spilling:
                runs.append(_Run.write(arrays, tmpdir, len(runs)))
            else:
                in_memory.append(arrays)
                in_memory_bytes += sum(a.nbytes for a in arrays)

        if spilling:  # external k-way merge of sorted byte-matrix runs
            _merge_to_outputs(runs, outputs)
        else:
            writers = [_zstd_writer(out) for out in outputs]
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


def _distill_checkpointed(
    filenames: list[str],
    outputs: list[str],
    chunk_size: int,
    checkpoint_dir: str,
    info,
) -> list[str]:
    """Checkpointed distill: every chunk spills as a durable run (progress
    must survive a crash, so there is no in-memory accumulate path), the
    manifest advances after each spill, and the final merge re-runs from the
    persisted runs alone if the writer phase was interrupted."""
    ckpt = _DistillCheckpoint(
        checkpoint_dir,
        _DistillCheckpoint.make_fingerprint(filenames, outputs, chunk_size),
        info,
    )
    if not ckpt.input_exhausted:
        chunk_no = -1
        for chunk_no, cols in enumerate(_iter_tuple_chunks(filenames, chunk_size)):
            if chunk_no < ckpt.chunks_done:
                continue  # already spilled by a previous run: read-and-skip
            arrays = _sort_chunk(cols)
            info(f"sorted chunk {chunk_no}: {len(arrays[0]):,} sequences")
            ckpt.add_run(_Run.write(arrays, ckpt.dir, ckpt.chunks_done))
        if chunk_no + 1 < ckpt.chunks_done:
            raise RuntimeError(
                f"distill checkpoint covers {ckpt.chunks_done} chunks but the "
                f"inputs now yield only {chunk_no + 1}; refusing to emit "
                f"stale data — clear {checkpoint_dir} to restart"
            )
        ckpt.input_exhausted = True
        ckpt.save()

    _merge_to_outputs(ckpt.runs, outputs)
    ckpt.cleanup()
    info(f"wrote {', '.join(outputs)}")
    return outputs


def _iter_tuple_chunks_owned(
    filenames: list[str], chunk_size: int, owner: int, num_owners: int,
    done_chunks=frozenset(),
):
    """Chunk-ownership variant of :func:`_iter_tuple_chunks` for multi-host
    distill: yields ``(chunk_no, cols)`` for EVERY chunk of the zipped
    stream, but parses only chunks this host owns
    (``chunk_no % num_owners == owner``) and has not already spilled
    (``done_chunks``); other chunks yield ``cols=None`` after a cheap
    byte-level skip. Stop conditions replicate the zip-to-shortest
    semantics so every host observes the identical chunk schedule."""
    from ..seqio.fast_reader import MatrixStream

    streams = [MatrixStream(fn) for fn in filenames]
    try:
        chunk_no = 0
        while True:
            mine = (
                chunk_no % num_owners == owner and chunk_no not in done_chunks
            )
            if mine:
                batches = [s.next_records(chunk_size) for s in streams]
                if any(b is None for b in batches):
                    break
                counts = [len(b[0]) for b in batches]
            else:
                counts = [s.skip_records(chunk_size) for s in streams]
                if any(c is None for c in counts):
                    break
            n = min(counts)
            if n == 0:
                break
            if mine:
                cols = []
                for mat, _lens in batches:
                    mat = np.ascontiguousarray(mat[:n])
                    w = max(mat.shape[1], 1)
                    cols.append(mat.view(f"S{w}").ravel())
                yield chunk_no, cols
            else:
                yield chunk_no, None
            chunk_no += 1
            if any(c > n for c in counts):
                break  # a shorter file ended mid-chunk: zip semantics
    finally:
        for s in streams:
            s.close()


# schema version of the per-host multi-host manifest (entries are
# [chunk_no, run_name, n, widths] — a different format from
# _DistillCheckpoint's, hence its own constant): bump on any entry-format
# change so old manifests invalidate instead of being misparsed
_MH_MANIFEST_VERSION = 1


def _distill_multihost(
    filenames: list[str],
    outputs: list[str],
    chunk_size: int,
    checkpoint_dir: str | None,
    info,
) -> list[str]:
    """Multi-host distill (the distributed generalization of the
    reference's sorter pool, distillreads.py:350-433): the expensive
    phase — read + lexsort + zstd run compression — is divided by chunk
    ownership (chunk i → host i mod K) with each host spilling durable
    runs named by chunk number into the SHARED ``checkpoint_dir``; after
    an all-gather of the per-host run manifests (which doubles as the
    completion barrier), host 0 alone streams the k-way merge into the
    outputs. Per-host manifests give independent crash resume — hosts
    never need lockstep, only the two barriers.

    Without a checkpoint_dir there is no agreed shared spill area, so
    host 0 distills alone while the others wait at the barrier (identical
    outputs, no write race)."""
    import jax

    from ..parallel.multihost import allgather_bytes

    K, h = jax.process_count(), jax.process_index()
    if not checkpoint_dir:
        info("multi-host distill without a checkpoint dir: host 0 distills alone")
        if h == 0:
            _distill_local(filenames, outputs, chunk_size, None, info)
        allgather_bytes(b"done")  # outputs complete before any host returns
        return outputs

    os.makedirs(checkpoint_dir, exist_ok=True)
    # K in the fingerprint: resuming with a different process count would
    # re-partition chunk ownership over stale per-host done-sets, spill
    # overlapping run files, and hard-fail the coverage check — losing all
    # durable progress (r5 review)
    fp = dict(
        _DistillCheckpoint.make_fingerprint(filenames, outputs, chunk_size),
        processes=K,
    )
    manifest = os.path.join(checkpoint_dir, f"manifest.p{h}.json")
    done: dict[int, list] = {}
    if os.path.exists(manifest):
        try:
            with open(manifest) as fh:
                st = json.load(fh)
        except (OSError, ValueError):
            st = None
        if st is not None:
            if st.get("version") == _MH_MANIFEST_VERSION and st.get(
                "fingerprint"
            ) == fp and all(
                os.path.exists(os.path.join(checkpoint_dir, r[1]))
                for r in st.get("runs", [])
            ):
                done = {int(r[0]): r for r in st["runs"]}
                if done:
                    info(
                        f"host {h}: resuming multi-host distill, "
                        f"{len(done)} chunk(s) already spilled"
                    )
            else:
                # stale manifest (inputs changed): remove the orphaned run
                # files THIS host's manifest owns — leftovers past the new
                # chunk count would otherwise accumulate and later trip the
                # spill-coverage consistency check
                for r in st.get("runs", []):
                    p = os.path.join(checkpoint_dir, os.path.basename(r[1]))
                    if os.path.exists(p):
                        os.unlink(p)
                info(f"host {h}: distill checkpoint does not match inputs; starting fresh")

    def save_manifest() -> None:
        tmp = manifest + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "version": _MH_MANIFEST_VERSION,
                    "fingerprint": fp,
                    "runs": sorted(done.values()),
                },
                fh,
            )
        os.replace(tmp, manifest)

    save_manifest()
    for chunk_no, cols in _iter_tuple_chunks_owned(
        filenames, chunk_size, h, K, done_chunks=frozenset(done)
    ):
        if cols is None:
            continue
        arrays = _sort_chunk(cols)
        run = _Run.write(arrays, checkpoint_dir, chunk_no, name=f"run{chunk_no}.zst")
        done[chunk_no] = [chunk_no, os.path.basename(run.path), run.n,
                          list(run.widths)]
        save_manifest()
        info(f"host {h}: spilled chunk {chunk_no} ({run.n:,} sequences)")

    # barrier + manifest exchange: every host learns every run
    metas: list = []
    for blob in allgather_bytes(json.dumps(sorted(done.values())).encode()):
        metas.extend(json.loads(blob))
    metas.sort(key=lambda r: r[0])
    nums = [m[0] for m in metas]
    if nums != list(range(len(nums))):
        raise RuntimeError(
            "multi-host distill spill coverage is inconsistent (stale "
            f"checkpoint dir?): chunk ids {nums}; clear {checkpoint_dir} "
            "and rerun"
        )
    if h == 0:
        runs = [
            _Run(os.path.join(checkpoint_dir, name), n, widths)
            for _no, name, n, widths in metas
        ]
        _merge_to_outputs(runs, outputs)
    allgather_bytes(b"merged")  # outputs complete before any host returns
    if h == 0:
        for _no, name, *_rest in metas:
            p = os.path.join(checkpoint_dir, name)
            if os.path.exists(p):
                os.unlink(p)
        import glob

        for m in glob.glob(os.path.join(checkpoint_dir, "manifest.p*.json")):
            os.unlink(m)
    info(f"wrote {', '.join(outputs)}")
    return outputs
