"""PAM-mask boundary exactness: every position within MAX_PAM+L of the
origin/end must match the host reference for all directions — this is where
the slice-based device mask depends on the extended wrap halo."""

import numpy as np
import pytest

import jax.numpy as jnp

from barcoder_tpu.core.genome import contig_from_record
from barcoder_tpu.core.pam import pam_site_masks
from barcoder_tpu.ops.pallas_scan import (
    MAX_PAM,
    _geom_bucket,
    _pam_ok_device,
    _pam_specs,
    prep_scan_padded,
)
from barcoder_tpu.ops.prep import build_scan_array

from .genomes import make_record


def pat_arr(pat):
    arr = np.full(MAX_PAM, 7, dtype=np.int8)
    arr[: len(pat)] = pat
    return jnp.asarray(arr)


@pytest.mark.parametrize("topology", ["circular", "linear"])
@pytest.mark.parametrize("L", [20, 32])
@pytest.mark.parametrize("pam,direction", [
    ("NGG", "downstream"),
    ("NGNC", "downstream"),
    ("TTTNNNGGGCCC", "downstream"),  # MAX_PAM-length pattern
    ("TTTN", "upstream"),
])
def test_boundary_positions_exact(topology, L, pam, direction):
    # plant GG-rich sequence near both ends so boundary PAMs actually match
    rec = make_record(n=1200, topology=topology, seed=hash((topology, L, pam)) % 997)
    rec.seq = "G" * 40 + rec.seq[40:-40] + "G" * 40
    contig = contig_from_record(rec)
    n = contig.length
    host_f, host_r = pam_site_masks(contig, L, pam, direction)

    scan = build_scan_array(contig, L)
    n_b = _geom_bucket(n, 256)
    scan_dev = jnp.asarray(prep_scan_padded(contig, scan, L, n_b, 32 + MAX_PAM))
    shift_f, pat_f, shift_r, pat_r = _pam_specs(pam, direction, L)
    for shift, pat, host in ((shift_f, pat_f, host_f), (shift_r, pat_r, host_r)):
        dev = np.asarray(
            _pam_ok_device(
                scan_dev, jnp.int32(n), jnp.int32(shift), pat_arr(pat),
                n_starts_b=n_b, L=L, circular=contig.circular,
            )
        )
        # whole-genome agreement, with special attention to the boundaries
        assert np.array_equal(dev[:n], host)
        boundary = np.r_[0 : MAX_PAM + L, n - MAX_PAM - L : n]
        assert np.array_equal(dev[boundary], host[boundary])
        assert not dev[n:].any()
