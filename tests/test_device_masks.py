"""Device-side PAM mask (_pam_ok_device) must agree with the host
reference implementation (core.pam.pam_site_masks) for every direction,
strand, topology, and PAM pattern."""

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
from barcoder_tpu.ops.types import STRAND_F, STRAND_R

from .genomes import make_record


@pytest.mark.parametrize("topology", ["circular", "linear"])
@pytest.mark.parametrize("pam,direction", [
    ("NGG", "downstream"),
    ("TTTN", "upstream"),
    ("NGNC", "downstream"),
    ("", "downstream"),
    ("N", "downstream"),
    ("CC", "upstream"),
])
def test_device_mask_matches_host(topology, pam, direction):
    L = 20
    rec = make_record(n=3000, topology=topology, seed=hash((topology, pam)) % 1000)
    if topology == "circular":
        # add some genomic Ns to exercise wildcard-vs-N semantics
        rec.seq = rec.seq[:500] + "N" + rec.seq[501:]
    contig = contig_from_record(rec)
    n = contig.length
    host_f, host_r = pam_site_masks(contig, L, pam, direction)

    scan = build_scan_array(contig, L)
    n_b = _geom_bucket(n, 256)
    scan_dev = jnp.asarray(prep_scan_padded(contig, scan, L, n_b, 32 + MAX_PAM))

    shift_f, pat_f, shift_r, pat_r = _pam_specs(pam, direction, L)

    def pat_arr(pat):
        from barcoder_tpu.ops.pallas_scan import MAX_PAM

        arr = np.full(MAX_PAM, 7, dtype=np.int8)
        arr[: len(pat)] = pat
        return jnp.asarray(arr)

    dev_f = np.asarray(
        _pam_ok_device(scan_dev, jnp.int32(n), jnp.int32(shift_f), pat_arr(pat_f),
                       n_starts_b=n_b, L=L, circular=contig.circular)
    )
    dev_r = np.asarray(
        _pam_ok_device(scan_dev, jnp.int32(n), jnp.int32(shift_r), pat_arr(pat_r),
                       n_starts_b=n_b, L=L, circular=contig.circular)
    )
    assert np.array_equal(dev_f[:n], host_f), "forward mask mismatch"
    assert np.array_equal(dev_r[:n], host_r), "reverse mask mismatch"
    assert not dev_f[n:].any() and not dev_r[n:].any(), "padding must be masked"


def test_invalid_pam_letter_never_matches():
    rec = make_record(n=1000, seed=9)
    contig = contig_from_record(rec)
    scan = build_scan_array(contig, 20)
    n_b = _geom_bucket(contig.length, 256)
    scan_padded = prep_scan_padded(contig, scan, 20, n_b, 32 + MAX_PAM)

    shift_f, pat_f, _, _ = _pam_specs("RGG", "downstream", 20)
    arr = np.full(MAX_PAM, 7, dtype=np.int8)
    arr[: len(pat_f)] = pat_f
    dev_f = np.asarray(
        _pam_ok_device(jnp.asarray(scan_padded), jnp.int32(contig.length),
                       jnp.int32(shift_f), jnp.asarray(arr),
                       n_starts_b=n_b, L=20, circular=True)
    )
    assert not dev_f.any()
