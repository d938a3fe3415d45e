"""Device mesh helpers.

The framework's distributed model (SURVEY.md §2 parallelism inventory):
genome-axis sharding over a 1-D ``genome`` mesh axis (each device scans a
contiguous tile of positions, with wrap halos materialized host-side), the
spacer library replicated, per-shard hit counts merged with ``psum`` and hit
lists gathered with ``all_gather``. This replaces the reference's host-only
process pools and Bowtie threads (heuristicount.py:720-722,
targets.py:499-504); there is no NCCL/MPI — collectives ride ICI/DCN via XLA.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


GENOME_AXIS = "genome"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the genome axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (GENOME_AXIS,))
