"""Seeded fuzz sweep: random (genome, library, PAM, direction, L, v,
topology) configs must agree between the XLA scan path and the numpy
oracle. Complements the targeted cases in test_scan.py by walking the
config space the CLIs actually expose (SURVEY.md §4 property-test
strategy)."""

import numpy as np
import pytest

from barcoder_tpu.core.genome import contig_from_record
from barcoder_tpu.ops.oracle import oracle_scan
from barcoder_tpu.ops.ref_scan import jax_scan

from .genomes import make_record, plant_guide, random_seq

PAMS = ["NGG", "NGNC", "NAG", "N", "TTTN", ""]


def tuples(h):
    return set(
        zip(h.spacer_idx.tolist(), h.pos.tolist(), h.strand.tolist(), h.mismatches.tolist())
    )


def _mutate(seq: str, k: int, rng) -> str:
    """k distinct-position substitutions (always to a different base)."""
    s = list(seq)
    for p in rng.choice(len(s), size=k, replace=False):
        s[p] = "ACGT"[(("ACGT".index(s[p])) + int(rng.integers(1, 4))) % 4]
    return "".join(s)


@pytest.mark.parametrize("seed", range(8))
def test_random_config_agreement(seed):
    rng = np.random.default_rng(1000 + seed)
    L = int(rng.choice([20, 24, 28, 32]))
    v = int(rng.integers(0, 4))
    pam = PAMS[int(rng.integers(0, len(PAMS)))]
    direction = "downstream" if rng.integers(0, 2) else "upstream"
    topology = "circular" if rng.integers(0, 2) else "linear"
    n = int(rng.integers(2500, 6000))

    rec = make_record(n=n, topology=topology, seed=seed)
    # library: pure-random spacers + genome-derived spacers mutated at
    # exactly v (must hit) and v+1 (must miss that site) positions
    spacers = [random_seq(L, rng) for _ in range(3)]
    body = rec.seq
    for _ in range(3):
        p = int(rng.integers(0, n - L))
        w = body[p : p + L]
        if "N" in w:
            continue
        spacers.append(_mutate(w, v, rng) if v else w)
        spacers.append(_mutate(w, min(v + 1, L), rng))
    # a planted guide with a compatible PAM so non-empty results are common
    g = random_seq(L, rng)
    concrete = (pam or "N").replace("N", "A")
    plant_guide(rec, g, int(rng.integers(50, n - 2 * L - 8)), pam=concrete,
                strand="F", pam_direction=direction)
    spacers.append(g)

    contig = contig_from_record(rec)
    a = tuples(oracle_scan(spacers, contig, v, pam=pam, pam_direction=direction))
    b = tuples(jax_scan(spacers, contig, v, pam=pam, pam_direction=direction))
    assert a == b, (
        f"seed={seed} L={L} v={v} pam={pam!r} dir={direction} topo={topology}: "
        f"only_oracle={sorted(a - b)[:5]} only_jax={sorted(b - a)[:5]}"
    )
    if pam.replace("N", "") == "" or concrete == pam.replace("N", "A"):
        # the planted guide must be found when its PAM matches the pattern
        g_idx = len(spacers) - 1
        assert any(t[0] == g_idx and t[3] == 0 for t in b)


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(6))
def test_random_config_agreement_sharded(seed):
    """The same fuzz walk through the MULTI-DEVICE engine (8-fake-device
    mesh, random P/sub_width, both site modes) — boundary halos, site
    sharding, capacity retries, and packed-hit decode under random
    geometry must agree with the oracle exactly."""
    import jax

    from barcoder_tpu.parallel.mesh import make_mesh
    from barcoder_tpu.parallel.sharded_scan import sharded_scan

    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(7000 + seed)
    L = int(rng.choice([20, 24, 32]))
    v = int(rng.integers(0, 3))
    pam = PAMS[int(rng.integers(0, len(PAMS)))]
    direction = "downstream" if rng.integers(0, 2) else "upstream"
    topology = "circular" if rng.integers(0, 2) else "linear"
    n = int(rng.integers(4000, 9000))
    P = int(rng.choice([128, 256, 512]))
    sub_width = int(rng.choice([64, 128]))
    site_mode = "auto" if rng.integers(0, 2) else "never"

    rec = make_record(n=n, topology=topology, seed=seed)
    spacers = [random_seq(L, rng) for _ in range(3)]
    body = rec.seq
    for _ in range(3):
        p = int(rng.integers(0, n - L))
        w = body[p : p + L]
        if "N" in w:
            continue
        spacers.append(_mutate(w, v, rng) if v else w)
        spacers.append(_mutate(w, min(v + 1, L), rng))
    g = random_seq(L, rng)
    concrete = (pam or "N").replace("N", "A")
    plant_guide(rec, g, int(rng.integers(50, n - 2 * L - 8)), pam=concrete,
                strand="F", pam_direction=direction)
    spacers.append(g)

    contig = contig_from_record(rec)
    a = tuples(oracle_scan(spacers, contig, v, pam=pam, pam_direction=direction))
    b = tuples(sharded_scan(
        spacers, contig, v, pam=pam, pam_direction=direction,
        mesh=make_mesh(8), P=P, sub_width=sub_width, site_mode=site_mode,
    ))
    assert a == b, (
        f"seed={seed} L={L} v={v} pam={pam!r} dir={direction} topo={topology} "
        f"P={P} sub={sub_width} mode={site_mode}: "
        f"only_oracle={sorted(a - b)[:5]} only_sharded={sorted(b - a)[:5]}"
    )
