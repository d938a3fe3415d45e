"""Vectorized hit→gene interval join.

Replaces the reference's per-base dict lookup
(``locus_map.get((chr, pos))`` over every covered base, targets.py:412-416)
with a sorted-interval searchsorted join: genes sorted by join_start; for a
query [a, b) the candidates are genes with start in [a - max_gene_len, b),
then exact overlap is checked. Bacterial genomes have short, sparse genes so
the candidate window stays small.

Join semantics (derived from the reference's folded-coordinate lookup):
queries use the reported hit interval [tar_start, tar_end) where tar_start
may be negative for origin-wrapping hits; only genome positions in [0, len)
carry gene entries, so the query is clipped to [max(tar_start, 0), tar_end)
and matched against each entry's clipped [join_start, join_end).
"""

from __future__ import annotations

import numpy as np

from .genome import Contig


def join_hits_to_loci(
    contig: Contig, tar_starts: np.ndarray, tar_ends: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Return (hit_indices, entry_indices) pairs for every overlapping
    (hit, locus entry) combination. Entry indices index
    ``contig.locus_entries``."""
    tar_starts = np.asarray(tar_starts, dtype=np.int64)
    tar_ends = np.asarray(tar_ends, dtype=np.int64)
    n_hits = len(tar_starts)
    order, starts_sorted, ends_sorted, max_len = contig.join_arrays()
    if n_hits == 0 or len(order) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)

    a = np.maximum(tar_starts, 0)
    b = tar_ends
    lo = np.searchsorted(starts_sorted, a - max_len, side="left")
    hi = np.searchsorted(starts_sorted, b, side="left")
    counts = np.maximum(hi - lo, 0)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)

    # ragged expansion: hit h paired with candidate slots lo[h]..hi[h)
    hit_idx = np.repeat(np.arange(n_hits), counts)
    offsets = np.concatenate(([0], np.cumsum(counts)))[:-1]
    within = np.arange(total) - np.repeat(offsets, counts)
    cand = np.repeat(lo, counts) + within

    # exact overlap check against clipped intervals
    qa = a[hit_idx]
    qb = b[hit_idx]
    keep = (starts_sorted[cand] < qb) & (ends_sorted[cand] > qa)
    return hit_idx[keep], order[cand[keep]]
