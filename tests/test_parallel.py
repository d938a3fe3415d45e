"""Multi-device sharded scan: correctness vs oracle on an 8-fake-device CPU
mesh (conftest forces --xla_force_host_platform_device_count=8)."""

import numpy as np
import pytest

import jax

from barcoder_tpu.core.genome import contig_from_record
from barcoder_tpu.ops.oracle import oracle_scan
from barcoder_tpu.parallel.mesh import make_mesh, make_mesh_2d
from barcoder_tpu.parallel.sharded_scan import sharded_scan

from .genomes import make_record, plant_guide, random_seq


def tuples(h):
    return set(zip(h.spacer_idx.tolist(), h.pos.tolist(), h.strand.tolist(), h.mismatches.tolist()))


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 fake devices"
    return make_mesh(8)


class TestShardedScan:
    @pytest.mark.parametrize("topology", ["circular", "linear"])
    @pytest.mark.parametrize("site_mode", ["auto", "never"])
    def test_agreement(self, mesh8, topology, site_mode):
        rng = np.random.default_rng(0)
        rec = make_record(n=9000, topology=topology, seed=0)
        spacers = [random_seq(20, rng) for _ in range(5)]
        for i, s in enumerate(spacers):
            plant_guide(rec, s, 700 + 1500 * i, pam="TGG", strand="F" if i % 2 else "R")
        contig = contig_from_record(rec)
        a = tuples(oracle_scan(spacers, contig, 1, pam="NGG"))
        b = tuples(sharded_scan(spacers, contig, 1, pam="NGG", mesh=mesh8, P=256,
                                site_mode=site_mode))
        assert a == b
        assert len(a) >= 5

    def test_device_boundary_hits(self, mesh8):
        # hits planted exactly at per-device block boundaries must survive
        # the ppermute halo exchange. n=8192, P=256 → per-device B=1024.
        rng = np.random.default_rng(1)
        rec = make_record(n=8192, topology="circular", seed=1)
        g = random_seq(20, rng)
        for p in [1024 - 10, 2048 - 1, 4096 - 19, 8192 - 5]:
            plant_guide(rec, g, p)
        contig = contig_from_record(rec)
        a = tuples(oracle_scan([g], contig, 0))
        b = tuples(sharded_scan([g], contig, 0, mesh=mesh8, P=256))
        assert a == b
        positions = {t[1] for t in b}
        assert {1014, 2047, 4077, 8187} <= positions

    @pytest.mark.parametrize("n,topology", [
        (8211, "linear"),    # n_starts=8192 = old 8*B exactly: tail windows
        (8187, "circular"),  # old total-n = 5 < L-1: wrap windows
        (8192, "linear"),    # exact multiple, tail band
        (8200, "circular"),  # total-n = 8*1024-8200 < 19
    ])
    def test_boundary_band_geometries(self, mesh8, n, topology):
        """Dense-path regression: when the per-device block total lands
        within L-1 of n_starts, tail/wrap windows used to read the ring
        halo's device-0 codes instead of the real scan tail and silently
        lost hits. Plant a guide in the band and require oracle equality."""
        rng = np.random.default_rng(n)
        rec = make_record(n=n, topology=topology, seed=n % 97)
        g_tail = rec.seq[n - 20 :] if topology == "linear" else None
        spacers = [random_seq(20, rng)]
        if topology == "linear":
            spacers.append(g_tail)  # window ending exactly at the tail
        else:
            # a window spanning the origin wrap
            spacers.append(rec.seq[n - 10 :] + rec.seq[:10])
        contig = contig_from_record(rec)
        a = tuples(oracle_scan(spacers, contig, 1))
        b = tuples(sharded_scan(spacers, contig, 1, mesh=mesh8, P=256,
                                site_mode="never"))
        assert a == b
        assert any(t[0] == 1 for t in b), "planted tail/wrap spacer lost"

    @pytest.mark.parametrize("n_lib,n_gen", [(2, 4), (4, 2), (8, 1)])
    @pytest.mark.slow
    def test_library_axis_sharding(self, n_lib, n_gen):
        # TP analog: spacer-library axis sharded over the mesh. 300 spacers
        # span 3 BS=128 blocks, so shards hold unequal real block counts and
        # the shard-local -> global block mapping is exercised.
        rng = np.random.default_rng(3)
        rec = make_record(n=6000, topology="circular", seed=3)
        spacers = [random_seq(20, rng) for _ in range(300)]
        for i in (0, 129, 257, 299):  # spacers on several library shards
            plant_guide(rec, spacers[i], 500 + 37 * i, pam="AGG",
                        strand="F" if i % 2 else "R")
        contig = contig_from_record(rec)
        mesh = make_mesh_2d(n_lib, n_gen)
        a = tuples(oracle_scan(spacers, contig, 1, pam="NGG"))
        b = tuples(sharded_scan(spacers, contig, 1, pam="NGG", mesh=mesh, P=256))
        assert a == b
        planted = {s for s, *_ in b}
        assert {0, 129, 257, 299} <= planted

    @pytest.mark.slow
    def test_library_sharding_matches_genome_only_mesh(self, mesh8):
        rng = np.random.default_rng(4)
        rec = make_record(n=4096, topology="linear", seed=4)
        spacers = [random_seq(20, rng) for _ in range(10)]
        plant_guide(rec, spacers[7], 2048 - 10, pam="CGG")
        contig = contig_from_record(rec)
        a = tuples(sharded_scan(spacers, contig, 2, pam="NGG", mesh=mesh8, P=256))
        mesh2d = make_mesh_2d(2, 4)
        b = tuples(sharded_scan(spacers, contig, 2, pam="NGG", mesh=mesh2d, P=256))
        assert a == b and len(b) >= 1

    def test_origin_wrap_on_last_device(self, mesh8):
        rng = np.random.default_rng(2)
        rec = make_record(n=8000, topology="circular", seed=2)
        g = random_seq(20, rng)
        plant_guide(rec, g, 7995)  # wraps origin; genome pads to 8192
        contig = contig_from_record(rec)
        b = tuples(sharded_scan([g], contig, 0, mesh=mesh8, P=256))
        assert any(p == 7995 for _, p, _, _ in b)
        a = tuples(oracle_scan([g], contig, 0))
        assert a == b

    def test_L32_per_strand_path(self, mesh8):
        # 32-mers leave no spare G rows (4L == K), so the sharded engine
        # must take the additive per-strand branch instead of strand fusing
        rng = np.random.default_rng(5)
        rec = make_record(n=6000, topology="circular", seed=5)
        spacers = [random_seq(32, rng) for _ in range(4)]
        for i, s in enumerate(spacers):
            plant_guide(rec, s, 800 + 1200 * i, pam="TGG",
                        strand="F" if i % 2 else "R")
        contig = contig_from_record(rec)
        a = tuples(oracle_scan(spacers, contig, 1, pam="NGG"))
        b = tuples(sharded_scan(spacers, contig, 1, pam="NGG", mesh=mesh8, P=256))
        assert a == b and len(a) >= 4

    @pytest.mark.slow
    def test_capacity_overflow_retry(self, mesh8):
        # poly-A genome x poly-A spacer: every position hits, overflowing a
        # deliberately tiny pair/hit capacity -> the packed-header overflow
        # signal must drive doubling retries to a complete result
        rec = make_record(n=4096, topology="linear", seed=6)
        rec.seq = "A" * 4096
        contig = contig_from_record(rec)
        g = "A" * 20
        a = tuples(oracle_scan([g], contig, 0))
        b = tuples(sharded_scan([g], contig, 0, mesh=mesh8, P=256,
                                pair_cap=4, hit_cap=8))
        assert a == b
        assert len(b) == 4096 - 20 + 1

    @pytest.mark.slow
    def test_subtile_decode(self, mesh8):
        # SUB > 1 (sub_width < P): the (t_big, subtile) -> P2-grid decode
        # and the per-subtile phase-2 masks are exercised
        rng = np.random.default_rng(7)
        rec = make_record(n=8192, topology="circular", seed=7)
        g = random_seq(20, rng)
        for p in [100, 1024 - 3, 3000, 8192 - 7]:
            plant_guide(rec, g, p)
        contig = contig_from_record(rec)
        a = tuples(oracle_scan([g], contig, 0))
        b = tuples(sharded_scan([g], contig, 0, mesh=mesh8, P=512, sub_width=128))
        assert a == b


def test_caps_memo_skips_retry_on_repeat_scans(mesh8_module=None):
    """The grown capacities persist across scans (r3 perf fix): the first
    overflowing scan retries, the second runs clean in ONE attempt —
    without the memo every scan paid a full second engine round."""
    from barcoder_tpu.parallel import sharded_scan as ss

    rec = make_record(n=4096, topology="linear", seed=16)
    rec.seq = "A" * 4096
    contig = contig_from_record(rec)
    g = "A" * 20
    mesh = make_mesh(2)
    kw = dict(mesh=mesh, P=256, pair_cap=4, hit_cap=8, pam="NAA", site_mode="always")
    ss._CAPS_MEMO.clear()
    a = tuples(sharded_scan([g], contig, 0, **kw))
    first_attempts = ss.LAST_TIMINGS["attempts"]
    assert first_attempts > 1, "tiny caps must overflow on the first scan"
    b = tuples(sharded_scan([g], contig, 0, **kw))
    assert ss.LAST_TIMINGS["attempts"] == 1, "memo must pre-size the repeat scan"
    assert a == b == tuples(oracle_scan([g], contig, 0, pam="NAA"))


class TestShardedScanMany:
    def test_matches_individual_scans(self, mesh8):
        """Batched serving (dispatch-all-then-collect) returns exactly the
        per-library sharded_scan results, in input order."""
        from barcoder_tpu.parallel.sharded_scan import sharded_scan_many

        rng = np.random.default_rng(9)
        rec = make_record(n=9000, topology="circular", seed=9)
        libs = []
        for k in range(5):
            spacers = [random_seq(20, rng) for _ in range(4)]
            plant_guide(rec, spacers[0], 500 + 1100 * k, pam="TGG")
            libs.append(spacers)
        contig = contig_from_record(rec)
        many = sharded_scan_many(
            libs, contig, 1, pam="NGG", mesh=mesh8, P=256, max_pending=2
        )
        assert len(many) == len(libs)
        total = 0
        for spacers, hits in zip(libs, many):
            solo = tuples(sharded_scan(
                spacers, contig, 1, pam="NGG", mesh=mesh8, P=256
            ))
            assert tuples(hits) == solo
            total += len(solo)
        assert total >= 5

    def test_requires_pam(self, mesh8):
        from barcoder_tpu.parallel.sharded_scan import sharded_scan_many

        rec = make_record(n=2000, seed=1)
        with pytest.raises(ValueError):
            sharded_scan_many([["A" * 20]], contig_from_record(rec), 0, pam="")

    def test_serving_cache_eviction(self, mesh8, monkeypatch):
        """Pin of the r4 serving-cache thrash bug (VERDICT r4 item 4):
        with MORE distinct libraries than the device-input cache budget,
        (a) results stay exact through evictions, and (b) a warm pass over
        a working set that FITS is all hits — zero re-built/re-shipped
        one-hots, which the old FIFO failed (100% thrash on the serving
        set, re-shipping ~21 MB per 'warm' pass)."""
        import barcoder_tpu.parallel.sharded_scan as ss

        small = ss._ShardDevCache(max_entries=4)
        monkeypatch.setattr(ss, "_Q_SHARD_CACHE", small)

        rng = np.random.default_rng(21)
        rec = make_record(n=9000, topology="circular", seed=21)
        libs = []
        for k in range(8):  # 2x the patched cache budget
            spacers = [random_seq(20, rng) for _ in range(3)]
            plant_guide(rec, spacers[0], 400 + 1000 * k, pam="TGG")
            libs.append(spacers)
        contig = contig_from_record(rec)
        kw = dict(mesh=mesh8, P=256)

        pass1 = ss.sharded_scan_many(libs, contig, 1, pam="NGG", **kw)
        st1 = small.stats()
        assert st1["evictions"] > 0  # budget genuinely exceeded
        assert st1["entries"] <= 4
        # exactness through evictions: every library equals its solo scan
        for spacers, hits in zip(libs, pass1):
            assert tuples(hits) == tuples(
                ss.sharded_scan(spacers, contig, 1, pam="NGG", **kw)
            )
        assert sum(len(tuples(h)) for h in pass1) >= 8

        # a working set that fits (the 2 most recent libraries) must be
        # fully warm: no misses, no bytes shipped
        small.reset_stats()
        pass3 = ss.sharded_scan_many(libs[-2:], contig, 1, pam="NGG", **kw)
        st3 = small.stats()
        assert st3["misses"] == 0 and st3["bytes_built"] == 0, st3
        assert st3["hits"] > 0
        for h, ref in zip(pass3, pass1[-2:]):
            assert tuples(h) == tuples(ref)


def test_sharded_rejects_oversized_spacers(mesh8):
    """The packed hit word carries mismatches in 6 bits (mm <= L <= 63);
    longer spacers must be rejected loudly, not silently corrupt
    spacer indices (r5 review)."""
    from barcoder_tpu.parallel.sharded_scan import sharded_scan

    rec = make_record(n=2000, seed=2)
    with pytest.raises(ValueError, match="up to 63"):
        sharded_scan(["A" * 64], contig_from_record(rec), 0, pam="",
                     mesh=mesh8, P=256)


def test_many_and_contigs_reject_oversized_spacers(mesh8):
    """sharded_scan_many / sharded_scan_contigs construct _SiteScanRun
    directly — they must hit the same L <= 63 guard as sharded_scan, not
    silently overflow the 6-bit mm field (r5 review: a 70-nt library
    returned corrupted spacer indices through the serving path)."""
    import barcoder_tpu.parallel.sharded_scan as ss

    rec = make_record(n=2000, seed=3)
    contig = contig_from_record(rec)
    with pytest.raises(ValueError, match="up to 63"):
        ss.sharded_scan_many([["A" * 70]], contig, 68, pam="NGG",
                             mesh=mesh8, P=256)
    with pytest.raises(ValueError, match="up to 63"):
        ss.sharded_scan_contigs(["A" * 70], [contig], 68, pam="NGG",
                                mesh=mesh8, P=256)


def test_bad_sub_width_raises_upfront(mesh8):
    """A sub_width whose derived SUB does not divide P must raise a clear
    ValueError up front — it used to fail deep inside tracing with an
    opaque reshape error (r5 review), and a silent pass would mis-map
    decoded positions."""
    from barcoder_tpu.parallel.sharded_scan import sharded_scan

    rec = make_record(n=4000, seed=4)
    contig = contig_from_record(rec)
    with pytest.raises(ValueError, match="sub_width"):
        sharded_scan(["ACGTACGTACGTACGTACGT"], contig, 1, pam="",
                     mesh=mesh8, P=2048, sub_width=600)
    with pytest.raises(ValueError, match="sub_width"):
        sharded_scan(["ACGTACGTACGTACGTACGT"], contig, 1, pam="NGG",
                     mesh=mesh8, P=2048, sub_width=600)


def test_allN_pam_routes_dense_and_agrees(mesh8):
    """An all-wildcard PAM ('N') has no informative base: site compaction
    would ship ~L_pad bytes per genome base for zero FLOP savings, so
    'auto' must take the dense fused path (r5 review) — and the results
    must match the oracle either way."""
    import barcoder_tpu.parallel.sharded_scan as ss

    assert not ss._want_sites("N", "auto")
    assert not ss._want_sites("NN", "auto")
    assert ss._want_sites("N", "always")
    assert ss._want_sites("NGG", "auto")
    assert not ss._want_sites("NGG", "never")

    rng = np.random.default_rng(11)
    rec = make_record(n=6000, seed=11)
    spacers = [random_seq(20, rng) for _ in range(4)]
    plant_guide(rec, spacers[0], 1200, pam="ACA")
    contig = contig_from_record(rec)
    before = ss._SITE_HOST_CACHE.stats()["misses"]
    hits = ss.sharded_scan(spacers, contig, 1, pam="N", mesh=mesh8, P=256)
    assert ss._SITE_HOST_CACHE.stats()["misses"] == before  # dense path
    assert tuples(hits) == tuples(oracle_scan(spacers, contig, 1, pam="N"))


def test_chunked_phase2_agrees(mesh8, monkeypatch):
    """The chunked phase-2 path (pair_cap above the ~1 GB transient
    budget): force a tiny chunk size so pair_cap=512 runs as multiple
    lax.map chunks on BOTH engines, and require exact oracle agreement on
    a hit-dense workload plus the planted-guide set."""
    import barcoder_tpu.parallel.sharded_scan as ss

    monkeypatch.setattr(ss, "_pair_chunk", lambda BS_M, P2: 128)
    ss._sharded_engine.cache_clear()
    ss._sharded_site_engine.cache_clear()
    try:
        rng = np.random.default_rng(12)
        rec = make_record(n=9000, topology="circular", seed=12)
        spacers = [random_seq(20, rng) for _ in range(6)]
        for i, s in enumerate(spacers):
            plant_guide(rec, s, 600 + 1200 * i, pam="TGG",
                        strand="F" if i % 2 else "R")
        contig = contig_from_record(rec)
        for pam, mode in [("NGG", "auto"), ("NGG", "never"), ("", "never")]:
            a = tuples(oracle_scan(spacers, contig, 1, pam=pam))
            b = tuples(ss.sharded_scan(
                spacers, contig, 1, pam=pam, mesh=mesh8, P=256,
                pair_cap=512, site_mode=mode,
            ))
            assert a == b, (pam, mode)
        # hit-dense: poly-A genome x poly-A spacer overflows pairs and
        # exercises chunked compaction + the retry protocol together
        rec2 = make_record(n=3000, seed=13)
        rec2.seq = "A" * 3000
        contig2 = contig_from_record(rec2)
        a2 = tuples(oracle_scan(["A" * 20], contig2, 0, pam=""))
        b2 = tuples(ss.sharded_scan(["A" * 20], contig2, 0, pam="",
                                    mesh=mesh8, P=256, pair_cap=512,
                                    site_mode="never"))
        assert a2 == b2
    finally:
        ss._sharded_engine.cache_clear()
        ss._sharded_site_engine.cache_clear()


def test_mesh_guards():
    """r5 review: make_mesh must not silently truncate past the device
    count (mislabels scaling results) and make_mesh_2d must reject a
    degenerate zero-genome grid."""
    import jax

    from barcoder_tpu.parallel.mesh import make_mesh, make_mesh_2d

    n = len(jax.devices())
    with pytest.raises(ValueError, match="devices"):
        make_mesh(n + 1)
    with pytest.raises(ValueError, match="devices"):
        make_mesh_2d(n * 2)
    assert make_mesh(n) is not None
