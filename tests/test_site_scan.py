"""Site-compacted scan mode (_SiteScanJob): PAM scans contract the genome
axis to the explicit PAM-valid site table; results must equal the oracle
(and hence the dense kernel) for every mismatch budget, topology, and
N placement. Runs the Pallas matrix kernel in interpret mode on CPU."""

import numpy as np
import pytest

from barcoder_tpu.core.genome import contig_from_record
from barcoder_tpu.ops.oracle import oracle_scan
from barcoder_tpu.ops.pallas_scan import pallas_scan
from barcoder_tpu.ops.prep import enumerate_sites

from .genomes import make_record, plant_guide, random_seq


def tuples(h):
    return set(
        zip(h.spacer_idx.tolist(), h.pos.tolist(), h.strand.tolist(), h.mismatches.tolist())
    )


@pytest.mark.parametrize("topology", ["circular", "linear"])
@pytest.mark.parametrize("v", [0, 1, 3])
def test_site_mode_matches_oracle(topology, v):
    rng = np.random.default_rng(23 + v)
    rec = make_record(n=3000, topology=topology, seed=23 + v)
    guides = [random_seq(20, rng) for _ in range(6)]
    for i, g in enumerate(guides):
        plant_guide(
            rec, g, 101 + i * 450,
            pam="TGG" if i % 3 else "AGG",
            strand="F" if i % 2 else "R",
        )
    contig = contig_from_record(rec)
    got = tuples(pallas_scan(
        guides, contig, v, pam="NGG", P=512, interpret=True, site_mode="always"
    ))
    want = tuples(oracle_scan(guides, contig, v, pam="NGG"))
    assert got == want
    assert len(got) >= 6


def test_site_mode_upstream_pam_and_n_bases():
    rng = np.random.default_rng(31)
    rec = make_record(n=2500, topology="circular", seed=31)
    g = random_seq(20, rng)
    plant_guide(rec, g, 400, pam="TTN", pam_direction="upstream")
    plant_guide(rec, g, 1200, pam="TTA", pam_direction="upstream")
    s = list(rec.seq)
    s[1207] = "N"  # one N inside the 1200 site: reachable only at v >= 1
    s[7] = "N"  # near origin
    rec.seq = "".join(s)
    contig = contig_from_record(rec)
    for v in (0, 1):
        got = tuples(pallas_scan(
            [g], contig, v, pam="TTN", pam_direction="upstream",
            P=512, interpret=True, site_mode="always",
        ))
        want = tuples(oracle_scan([g], contig, v, pam="TTN", pam_direction="upstream"))
        assert got == want, f"v={v}"
    assert any(p == 1200 for _, p, _, _ in got)


@pytest.mark.slow
def test_site_mode_agrees_with_dense_mode():
    rng = np.random.default_rng(37)
    rec = make_record(n=4000, topology="circular", seed=37)
    guides = [random_seq(20, rng) for _ in range(12)]
    for i, g in enumerate(guides):
        plant_guide(rec, g, 90 + i * 310, pam="CGG", strand="R" if i % 2 else "F")
    contig = contig_from_record(rec)
    dense = tuples(pallas_scan(guides, contig, 2, pam="NGG", P=512,
                               interpret=True, site_mode="never"))
    sites = tuples(pallas_scan(guides, contig, 2, pam="NGG", P=512,
                               interpret=True, site_mode="always"))
    assert dense == sites


def test_enumerate_sites_covers_all_pam_windows():
    rec = make_record(n=1500, topology="circular", seed=41)
    contig = contig_from_record(rec)
    pos, strand, codes = enumerate_sites(contig, 20, "NGG", "downstream")
    from barcoder_tpu.ops.prep import site_masks

    mf, mr = site_masks(contig, 20, "NGG", "downstream")
    assert len(pos) == int(mf[:1500].sum()) + int(mr[:1500].sum())
    assert codes.shape == (len(pos), 20)


@pytest.mark.slow
def test_site_mode_L32_no_spare_row():
    # 4L == K leaves no spare G row; matrix mode never folds bias so L=32
    # must work (dense mode falls back to per-strand additive there)
    rng = np.random.default_rng(43)
    rec = make_record(n=2500, topology="circular", seed=43)
    g = random_seq(32, rng)
    plant_guide(rec, g, 700, pam="TGG")
    contig = contig_from_record(rec)
    got = tuples(pallas_scan(
        [g], contig, 1, pam="NGG", P=512, interpret=True, site_mode="always"
    ))
    want = tuples(oracle_scan([g], contig, 1, pam="NGG"))
    assert got == want
    assert any(p == 700 for _, p, _, _ in got)


def test_site_batched_path_matches_spec_path(monkeypatch):
    """Small-library site scans use the speculative one-fetch phase 2; the
    design-scale batched path (spec gate off) must produce identical hits."""
    import barcoder_tpu.ops.pallas_scan as ps

    rng = np.random.default_rng(59)
    rec = make_record(n=3500, topology="circular", seed=59)
    guides = [random_seq(20, rng) for _ in range(8)]
    for i, g in enumerate(guides):
        plant_guide(rec, g, 120 + i * 400, pam="AGG", strand="R" if i % 2 else "F")
    contig = contig_from_record(rec)
    kw = dict(pam="NGG", P=512, interpret=True, site_mode="always")
    spec = tuples(pallas_scan(guides, contig, 2, **kw))
    monkeypatch.setattr(ps, "_SITE_MODE_MIN_SPACERS", 1)  # force batched
    batched = tuples(pallas_scan(guides, contig, 2, **kw))
    want = tuples(oracle_scan(guides, contig, 2, pam="NGG"))
    assert spec == batched == want


@pytest.mark.slow
def test_site_table_cache_and_repeat_policy(monkeypatch):
    """First small-library auto scan runs dense; the second on the same
    (genome, pam, L) builds + caches the site table; later scans reuse it
    without re-enumerating. Results identical throughout."""
    import barcoder_tpu.ops.pallas_scan as ps

    rng = np.random.default_rng(53)
    rec = make_record(n=3000, topology="circular", seed=53)
    guides = [random_seq(20, rng) for _ in range(4)]
    for i, g in enumerate(guides):
        plant_guide(rec, g, 150 + i * 600, pam="GGG")
    contig = contig_from_record(rec)
    want = tuples(oracle_scan(guides, contig, 1, pam="NGG"))

    ps._SITE_DEV_CACHE.clear()
    ps._SITE_SEEN.clear()
    calls = []
    real_enum = enumerate_sites
    monkeypatch.setattr(  # pallas_scan_contigs imports it from .prep per call
        "barcoder_tpu.ops.prep.enumerate_sites",
        lambda *a, **k: calls.append(1) or real_enum(*a, **k),
    )

    kw = dict(pam="NGG", P=512, interpret=True)
    assert tuples(pallas_scan(guides, contig, 1, **kw)) == want  # dense
    assert calls == []
    assert tuples(pallas_scan(guides, contig, 1, **kw)) == want  # builds
    assert len(calls) == 1
    assert tuples(pallas_scan(guides, contig, 1, **kw)) == want  # cached
    assert len(calls) == 1
    assert len(ps._SITE_DEV_CACHE) == 1

    # content change invalidates: mutate one base -> new key, dense again
    s = list(rec.seq)
    s[10] = "ACGT"[("ACGT".index(s[10]) + 1) % 4]
    rec.seq = "".join(s)
    contig2 = contig_from_record(rec)
    want2 = tuples(oracle_scan(guides, contig2, 1, pam="NGG"))
    assert tuples(pallas_scan(guides, contig2, 1, **kw)) == want2
    assert len(calls) == 1  # first scan of the new content stays dense


def test_site_mode_multi_contig():
    from barcoder_tpu.ops.pallas_scan import pallas_scan_contigs

    rng = np.random.default_rng(47)
    recs = [make_record(n=1500 + 400 * i, topology=t, seed=47 + i,
                        rec_id=f"MC{i}.1")
            for i, t in enumerate(["circular", "linear", "circular"])]
    g = random_seq(20, rng)
    for i, rec in enumerate(recs):
        plant_guide(rec, g, 300 + 100 * i, pam="AGG", strand="R" if i == 1 else "F")
    contigs = [contig_from_record(r) for r in recs]
    got = pallas_scan_contigs([g], contigs, 1, pam="NGG", interpret=True,
                              P=512, site_mode="always")
    for c, h in zip(contigs, got):
        assert tuples(h) == tuples(oracle_scan([g], c, 1, pam="NGG")), c.id
