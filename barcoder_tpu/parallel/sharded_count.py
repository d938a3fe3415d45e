"""Data-parallel barcode counting over a device mesh (shard_map + psum).

The reference's counting phase merges per-process ``Counter``s from a fork
pool (heuristicount.py:720-737). The TPU-native equivalent here shards the
read-batch axis over a 1-D mesh: each device exact-matches its rows against
the replicated barcode one-hot table on the MXU (the same formulation as
``pipeline.heuristic_count.DeviceCounter``), builds a per-barcode local
count vector, and the vectors merge on-device with ``lax.psum`` — the
collective Counter merge. The matched mask comes back sharded because
undocumented-barcode handling (heuristicount.py:517-518) needs the raw
sequences and stays on the host.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P_

from ..pipeline.heuristic_count import (
    CountConfig,
    DeviceCounter,
    _pack_cores_u32,
    _unpacked_onehot,
)
from .multihost import fetch_local_rows, put_global, put_process_local

READS_AXIS = "reads"


def make_read_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the read-batch (data-parallel) axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (READS_AXIS,))


class ShardedCounter(DeviceCounter):
    """DeviceCounter with the match matmul sharded over a read-batch mesh
    axis and documented counts merged on-device with ``psum``.

    Chunk semantics (flank windows, paired revcomp consistency, N filter,
    undocumented ``seq*`` counting) are inherited unchanged — only the
    exact-match + tally stage is distributed. Like the single-device
    engine, d2h is one packbits'd matched bit per read (sharded) plus the
    psum-merged count vector (replicated).

    On a process-spanning mesh (parallel.multihost) every host feeds the
    IDENTICAL chunk stream (plain SPMD: same argv, same files on each
    host) and process_matrices slices each chunk into equal-width per-host
    row windows internally — so no external driver can double-count, and
    the collective shapes stay in lockstep by construction. The psum
    leaves every host holding the identical GLOBAL documented-count
    vector (the reference's end-of-run Counter merge,
    heuristicount.py:734-737, happens on-device instead) and the same
    global total_reads; the undocumented tally stays host-local to each
    process's own row window (union over hosts = the single-process
    tally)."""

    def __init__(self, cfg: CountConfig, mesh: Mesh | None = None):
        super().__init__(cfg)
        self._mesh = mesh if mesh is not None else make_read_mesh()
        self._n_dev = int(self._mesh.devices.size)
        self._n_local_dev = sum(
            1 for d in self._mesh.devices.ravel()
            if d.process_index == jax.process_index()
        )
        if jax.process_count() > 1:
            # replicate the barcode table onto this process's mesh devices
            # (a bare jnp array is single-device and can't feed a
            # process-spanning shard_map)
            self._bc_oh = put_global(
                np.asarray(self._bc_oh), NamedSharding(self._mesh, P_())
            )

    def process_matrices(self, m1, m2) -> None:
        k = jax.process_count()
        if k > 1:
            n = m1.shape[0] if m1 is not None else (
                m2.shape[0] if m2 is not None else 0
            )
            per = -(-n // k)  # equal-width windows keep every process's
            # dispatch geometry identical (lockstep collectives)
            lo = jax.process_index() * per

            def cut(m):
                if m is None:
                    return None
                sl = m[lo : lo + per]
                if len(sl) < per:
                    # all-N pad rows: the no-N filter makes them ineligible
                    # everywhere, so they can neither count nor reach undoc
                    pad = np.full((per - len(sl), m.shape[1]), ord("N"), m.dtype)
                    sl = np.concatenate([sl, pad])
                return sl

            m1, m2 = cut(m1), cut(m2)
            # super() adds this host's `per` rows; top up so every host
            # reports the GLOBAL read total
            self.total_reads += n - per
        super().process_matrices(m1, m2)

    def _match_fn(self):
        if getattr(self, "_match_jit", None) is not None:
            return self._match_jit
        key = ("sharded", self.bc_len, self.B, int(self._bc_oh.shape[1]),
               self._READ_SLICE, self._mesh)
        cached = self._JIT_CACHE.get(key)
        if cached is not None:
            self._match_jit = cached
            return cached
        S = self._READ_SLICE
        bc_len, B = self.bc_len, self.B

        def shard_fn(codes_b, elig_b, bc_oh, acc):
            cs = codes_b.reshape(-1, S, 2)
            es = elig_b.reshape(-1, S)

            def one_slice(args):
                cc, el = args
                oh = _unpacked_onehot(cc, bc_len, jnp)
                scores = jnp.dot(oh, bc_oh, preferred_element_type=jnp.float32)
                best = jnp.argmax(scores, axis=1)
                exact = jnp.max(scores, axis=1) >= bc_len - 0.5
                matched = exact & el & (best < B)
                return best.astype(jnp.int32), matched

            idx, m = jax.lax.map(one_slice, (cs, es))
            idx, m = idx.reshape(-1), m.reshape(-1)
            local = jnp.zeros(acc.shape, jnp.int32).at[idx].add(m.astype(jnp.int32))
            # the on-device Counter merge: psum into the (replicated,
            # donated) global accumulator — every host's drain fetch sees
            # identical GLOBAL counts
            counts = acc + jax.lax.psum(local, READS_AXIS)
            return jnp.packbits(m), counts

        fn = jax.shard_map(
            shard_fn,
            mesh=self._mesh,
            in_specs=(P_(READS_AXIS), P_(READS_AXIS), P_(), P_()),
            out_specs=(P_(READS_AXIS), P_()),
            check_vma=False,
        )
        self._match_jit = jax.jit(fn, donate_argnums=(3,))
        self._JIT_CACHE[key] = self._match_jit
        while len(self._JIT_CACHE) > 16:
            self._JIT_CACHE.pop(next(iter(self._JIT_CACHE)))
        return self._match_jit

    def _zero_acc(self):
        return put_global(
            np.zeros((int(self._bc_oh.shape[1]),), np.int32),
            NamedSharding(self._mesh, P_()),
        )

    def _device_match_async(self, core_codes: np.ndarray, eligible: np.ndarray):
        n = core_codes.shape[0]
        # this process pads to ITS addressable quantum; the global row count
        # is the sum over processes (put_process_local, process order)
        quantum = self._n_local_dev * self._READ_SLICE
        # geometric quantum buckets: a tail batch reuses the full batch's
        # executable (see DeviceCounter._device_match_async)
        n_pad = quantum
        while n_pad < n:
            n_pad *= 2
        packed, has_n = _pack_cores_u32(core_codes)
        codes_p = np.zeros((n_pad, 2), np.uint32)  # 2-bit packed cores
        codes_p[:n] = packed
        elig_p = np.zeros(n_pad, bool)  # pad/N rows device-ineligible
        elig_p[:n] = eligible & ~has_n
        sharding = NamedSharding(self._mesh, P_(READS_AXIS))
        codes_d = put_process_local(codes_p, sharding)
        elig_d = put_process_local(elig_p, sharding)
        if self._acc is None:
            self._acc = self._zero_acc()
        mbits, self._acc = self._match_fn()(
            codes_d, elig_d, self._bc_oh, self._acc
        )
        # (n, matched-bits) + threaded accumulator: the DeviceCounter
        # drain contract
        return n, mbits

    def _drain_entry(self, entry) -> None:
        if jax.process_count() == 1:
            return super()._drain_entry(entry)
        # multi-host: the matched bits are row-sharded across processes —
        # this host unpacks only its addressable rows, which are exactly
        # its own reads (put_process_local row order); the count
        # accumulator is replicated and fetched once in drain()
        (n, mb_f), cores, eligible = entry
        matched = np.unpackbits(fetch_local_rows(mb_f))[:n].astype(bool)
        un = eligible & ~matched
        if un.any():
            uniq, counts = np.unique(cores[un], axis=0, return_counts=True)
            for row, cnt in zip(uniq, counts):
                seq = row.tobytes().decode("ascii", errors="replace").rstrip("\x00")
                self.undoc[seq + "*"] += int(cnt)
