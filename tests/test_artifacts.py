"""On-disk artifact cache: packed genomes + site tables persist across
processes (simulated by clearing the in-process device LRUs), corrupt
artifacts fall back to recompute (SURVEY.md §5 checkpoint/artifact row)."""

import os

import numpy as np
import pytest

import barcoder_tpu.ops.pallas_scan as ps
from barcoder_tpu.utils import artifacts

from .genomes import genome_from_records, make_record


@pytest.fixture()
def art_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("BARCODER_TPU_ARTIFACTS", str(tmp_path))
    monkeypatch.delenv("BARCODER_TPU_NO_ARTIFACTS", raising=False)
    return tmp_path


@pytest.fixture()
def contig():
    rec = make_record(n=4000, topology="circular", seed=31, n_genes=2)
    return genome_from_records([rec]).contigs[0]


def _clear_device_caches():
    ps._SCAN_DEV_CACHE.clear()
    ps._SITE_DEV_CACHE.clear()


@pytest.mark.slow
def test_site_table_persists_on_disk(art_dir, contig, monkeypatch):
    g = contig.seq[100:120]
    kw = dict(pam="NGG", P=512, interpret=True, site_mode="always")
    first = ps.pallas_scan([g], contig, 1, **kw)
    assert any(f.name.startswith("sites-") for f in art_dir.iterdir())

    # fresh process simulation: device LRUs gone, disk remains
    _clear_device_caches()
    calls = {"n": 0}
    import barcoder_tpu.ops.prep as prep_mod

    real = prep_mod.enumerate_sites

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(prep_mod, "enumerate_sites", counting)
    second = ps.pallas_scan([g], contig, 1, **kw)
    assert calls["n"] == 0, "site table should load from disk, not re-enumerate"
    assert (first.pos == second.pos).all() and (first.strand == second.strand).all()


@pytest.mark.slow
def test_packed_scan_persists_on_disk(art_dir, contig, monkeypatch):
    g = contig.seq[200:220]
    kw = dict(pam="NGG", P=512, interpret=True, site_mode="never")
    first = ps.pallas_scan([g], contig, 1, **kw)
    assert any(f.name.startswith("scan-") for f in art_dir.iterdir())

    _clear_device_caches()
    calls = {"n": 0}
    real = ps.prep_scan_padded

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(ps, "prep_scan_padded", counting)
    second = ps.pallas_scan([g], contig, 1, **kw)
    assert calls["n"] == 0, "packed scan should load from disk, not rebuild"
    assert (first.pos == second.pos).all() and (first.mismatches == second.mismatches).all()


def test_corrupt_artifact_falls_back(art_dir, contig):
    g = contig.seq[100:120]
    kw = dict(pam="NGG", P=512, interpret=True, site_mode="always")
    want = ps.pallas_scan([g], contig, 1, **kw)
    for f in art_dir.iterdir():
        f.write_bytes(b"not an npz")
    _clear_device_caches()
    got = ps.pallas_scan([g], contig, 1, **kw)
    assert (want.pos == got.pos).all()


def test_disabled_by_env(art_dir, contig, monkeypatch):
    monkeypatch.setenv("BARCODER_TPU_NO_ARTIFACTS", "1")
    _clear_device_caches()
    ps.pallas_scan([contig.seq[100:120]], contig, 0, pam="NGG", P=512,
                   interpret=True, site_mode="always")
    assert list(art_dir.iterdir()) == []


def test_store_and_load_roundtrip(art_dir):
    a = np.arange(10, dtype=np.int32)
    artifacts.store("test", "k1", x=a, y=a * 2)
    out = artifacts.load("test", "k1")
    assert (out["x"] == a).all() and (out["y"] == a * 2).all()
    assert artifacts.load("test", "nope") is None
    assert not any(f.name.endswith(".tmp.npz") for f in art_dir.iterdir())


@pytest.mark.slow
def test_disk_site_artifact_promotes_engine_on_first_call(art_dir, contig, monkeypatch):
    """A sites-*.npz on disk flips site_mode='auto' to the site engine from
    the FIRST call of a fresh process (VERDICT r2 item 2: skips compiling
    the dense engine on repeat processes)."""
    g = contig.seq[100:120]
    kw = dict(pam="NGG", P=512, interpret=True)

    # fresh process, empty disk: small library stays on the dense engine
    _clear_device_caches()
    ps._SITE_SEEN.clear()
    jobs = {"dense": 0, "site": 0}
    real_dense, real_site = ps._ScanJob, ps._SiteScanJob

    class CountingDense(real_dense):
        def __init__(self, *a, **k):
            jobs["dense"] += 1
            super().__init__(*a, **k)

    class CountingSite(real_site):
        def __init__(self, *a, **k):
            jobs["site"] += 1
            super().__init__(*a, **k)

    monkeypatch.setattr(ps, "_ScanJob", CountingDense)
    monkeypatch.setattr(ps, "_SiteScanJob", CountingSite)
    first = ps.pallas_scan([g], contig, 1, **kw)
    assert jobs == {"dense": 1, "site": 0}

    # build the site table on disk (forced), then simulate a fresh process
    ps.pallas_scan([g], contig, 1, site_mode="always", **kw)
    _clear_device_caches()
    ps._SITE_SEEN.clear()
    jobs["dense"] = jobs["site"] = 0
    second = ps.pallas_scan([g], contig, 1, **kw)
    assert jobs == {"dense": 0, "site": 1}, jobs
    assert (first.pos == second.pos).all() and (first.strand == second.strand).all()
