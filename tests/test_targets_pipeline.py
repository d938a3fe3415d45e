"""End-to-end tests of the targets workload against the reference's output
contract (schema frozen by Example_Libraries/CN-32-zmo.tsv)."""

import io

import numpy as np
import pandas as pd
import pytest

from barcoder_tpu.core.encode import revcomp
from barcoder_tpu.pipeline.targets import run_targets, write_output
from barcoder_tpu.seqio.library import BarcodeLibrary

from .genomes import genome_from_records, make_record, plant_guide, random_seq

GOLDEN_COLUMNS = [
    "spacer", "locus_tag", "gene", "chr", "pam", "mismatches", "target",
    "tar_start", "tar_end", "offset", "overlap", "sp_dir", "tar_dir", "note",
]


def build_case(seed=0, n=12_000, planted=None, topology="circular", wrapped_gene=False):
    rec = make_record(n=n, topology=topology, seed=seed, n_genes=8, wrapped_gene=wrapped_gene)
    planted = planted or []
    for g, pos, kwargs in planted:
        plant_guide(rec, g, pos, **kwargs)
    return rec, genome_from_records([rec])


class TestRunTargets:
    def test_basic_schema_and_hit(self):
        rng = np.random.default_rng(0)
        g = random_seq(20, rng)
        rec, genome = build_case(planted=[(g, 800, dict(pam="CGG"))])
        lib = BarcodeLibrary.from_list([g, random_seq(20, rng)])
        res = run_targets(lib, genome, "NGG", 1)
        df = res.table
        # count col excluded (all 1); pam col only if >1 distinct PAM
        # (reference column_order logic, targets.py:670-676)
        for col in ["spacer", "locus_tag", "gene", "chr", "target",
                    "tar_start", "tar_end", "offset", "overlap", "sp_dir", "tar_dir", "note"]:
            assert col in df.columns
        hit = df[(df.spacer == g) & (df.tar_start == 800)]
        assert len(hit) >= 1
        row = hit.iloc[0]
        assert row.tar_end == 820
        assert row.sp_dir == "F"
        assert row.target == g
        rrow = res.results[(res.results.spacer == g) & (res.results.tar_start == 800)].iloc[0]
        assert rrow["pam"] == "CGG"

    def test_gene_annotation_offset_overlap(self):
        rng = np.random.default_rng(1)
        g = random_seq(20, rng)
        # gene 0 occupies [0, 750) (n=12000, 8 genes, gene_len=750)
        rec, genome = build_case(seed=1, planted=[(g, 100, dict(pam="AGG"))])
        lib = BarcodeLibrary.from_list([g])
        res = run_targets(lib, genome, "NGG", 0)
        row = res.table[res.table.tar_start == 100].iloc[0]
        assert row.locus_tag == "TST_0000"
        assert row.gene == "gen0"
        assert row.offset == 100  # F gene starting at 0
        assert row.overlap == 20
        assert row.tar_dir == "F"
        assert row.note == "1 site, 1 gene"

    def test_reverse_strand_gene_offset(self):
        rng = np.random.default_rng(2)
        g = random_seq(20, rng)
        # gene 1 at [1500, 2250) strand -1
        rec, genome = build_case(seed=2, planted=[(g, 1600, dict(pam="TGG", strand="R"))])
        lib = BarcodeLibrary.from_list([g])
        res = run_targets(lib, genome, "NGG", 0)
        row = res.table[res.table.tar_start == 1600].iloc[0]
        assert row.sp_dir == "R"
        assert row.locus_tag == "TST_0001"
        assert row.tar_dir == "R"
        assert row.offset == 2250 - 1620  # feature_end - tar_end
        assert row.target == g

    def test_non_targeting_note(self):
        rng = np.random.default_rng(3)
        rec, genome = build_case(seed=3)
        missing = "A" * 20  # extremely unlikely in random genome at v=0
        lib = BarcodeLibrary.from_list([missing])
        res = run_targets(lib, genome, "NGG", 0)
        assert len(res.table) == 1
        row = res.table.iloc[0]
        assert row.note == "non-targeting"
        assert pd.isna(row.target)
        assert res.stats["non_targeting_barcodes"] == 1

    def test_pam_reject_makes_nontargeting(self):
        rng = np.random.default_rng(4)
        g = random_seq(20, rng)
        # plant with a PAM that cannot match NGG: set downstream context to TTT
        rec, genome = build_case(seed=4, planted=[(g, 900, dict(pam="TTT"))])
        lib = BarcodeLibrary.from_list([g])
        res = run_targets(lib, genome, "NGG", 0)
        sub = res.table[res.table.spacer == g]
        # either non-targeting (no other NGG site) or no row with tar_start 900
        assert not (sub.tar_start == 900).any()

    def test_mismatch_row_lowercase_target_and_diff(self):
        rng = np.random.default_rng(5)
        g = random_seq(20, rng)
        mutated = list(g)
        orig = mutated[7]
        mutated[7] = {"A": "C", "C": "G", "G": "T", "T": "A"}[orig]
        mutated = "".join(mutated)
        rec, genome = build_case(seed=5, planted=[(mutated, 1000, dict(pam="GGG"))])
        lib = BarcodeLibrary.from_list([g])
        res = run_targets(lib, genome, "NGG", 1)
        row = res.table[res.table.tar_start == 1000].iloc[0]
        assert row.mismatches == 1
        assert row.target[7] == mutated[7].lower()
        assert row.target.upper() == mutated
        # diff is in the dropped 'type/diff' internal columns; verify via
        # results frame
        rrow = res.results[res.results.tar_start == 1000].iloc[0]
        assert rrow["diff"] == f"{mutated[7].lower()}8{g[7]}"
        assert rrow["type"] == "mismatch"

    def test_origin_wrapping_hit_negative_start(self):
        rng = np.random.default_rng(6)
        g = random_seq(20, rng)
        n = 12_000
        rec, genome = build_case(seed=6, n=n, planted=[(g, n - 8, dict(pam="CGG"))])
        lib = BarcodeLibrary.from_list([g])
        res = run_targets(lib, genome, "NGG", 0)
        row = res.table[res.table.spacer == g].iloc[0]
        assert row.tar_start == -8
        assert row.tar_end == 12
        rrow = res.results[res.results.spacer == g].iloc[0]
        assert rrow.coords == f"({n - 8}..{n}, 0..12)"

    def test_count_column_for_duplicate_names(self):
        rng = np.random.default_rng(7)
        g = random_seq(20, rng)
        rec, genome = build_case(seed=7, planted=[(g, 2000, dict(pam="AGG"))])
        lib = BarcodeLibrary()
        lib.add(g, "name1")
        lib.add(g, "name2")
        res = run_targets(lib, genome, "NGG", 0)
        assert "count" in res.table.columns
        assert (res.table[res.table.spacer == g]["count"] == 2).all()

    def test_multi_gene_site_two_rows(self):
        # overlapping genes: add a second gene overlapping gene 0's region
        from barcoder_tpu.seqio.genbank import Feature, Location

        rng = np.random.default_rng(8)
        g = random_seq(20, rng)
        rec = make_record(n=12_000, seed=8, n_genes=8)
        rec.features.append(
            Feature("gene", Location(50, 500, -1), {"locus_tag": ["TST_EXTRA"]})
        )
        plant_guide(rec, g, 100, pam="GGG")
        genome = genome_from_records([rec])
        lib = BarcodeLibrary.from_list([g])
        res = run_targets(lib, genome, "NGG", 0)
        sub = res.table[res.table.tar_start == 100]
        assert set(sub.locus_tag) == {"TST_0000", "TST_EXTRA"}
        assert (sub.note == "1 site, 2 genes").all()
        extra = sub[sub.locus_tag == "TST_EXTRA"].iloc[0]
        assert extra.tar_dir == "R"
        assert extra.offset == 500 - 120

    def test_offtarget_note_counts_sites(self):
        rng = np.random.default_rng(9)
        g = random_seq(20, rng)
        rec, genome = build_case(
            seed=9, planted=[(g, 1000, dict(pam="AGG")), (g, 5000, dict(pam="TGG"))]
        )
        lib = BarcodeLibrary.from_list([g])
        res = run_targets(lib, genome, "NGG", 0)
        sub = res.table[res.table.spacer == g]
        assert (sub.note.str.startswith("2 sites")).all()
        assert res.stats["off_target_barcodes"] == 1

    def test_tsv_output_na_rep(self):
        rng = np.random.default_rng(10)
        rec, genome = build_case(seed=10)
        lib = BarcodeLibrary.from_list(["A" * 20])
        res = run_targets(lib, genome, "NGG", 0)
        buf = io.StringIO()
        write_output(res, buf)
        text = buf.getvalue()
        assert "None" in text  # na_rep
        header = text.splitlines()[0].split("\t")
        assert header[0] == "spacer"
        assert header[-1] == "note"

    def test_wrapped_gene_annotation(self):
        # gene joined across origin: hits inside the pre-origin segment are
        # annotated; reference quirk: hits only in the post-origin tail are
        # NOT (SURVEY/targets.py:102-128 analysis)
        rng = np.random.default_rng(11)
        g = random_seq(20, rng)
        n = 12_000
        rec = make_record(n=n, seed=11, n_genes=8, wrapped_gene=True)
        plant_guide(rec, g, n - 100, pam="CGG")  # inside wrapped gene pre-origin part
        genome = genome_from_records([rec])
        lib = BarcodeLibrary.from_list([g])
        res = run_targets(lib, genome, "NGG", 0)
        row = res.table[res.table.spacer == g].iloc[0]
        assert row.locus_tag == "TST_WRAP"
        assert row.offset == (n - 100) - (n - 120)

    def test_linear_genome(self):
        rng = np.random.default_rng(12)
        g = random_seq(20, rng)
        rec, genome = build_case(seed=12, topology="linear", planted=[(g, 500, dict(pam="AGG"))])
        lib = BarcodeLibrary.from_list([g])
        res = run_targets(lib, genome, "NGG", 0)
        assert (res.table[res.table.spacer == g].tar_start == 500).any()

    def test_mixed_length_library(self):
        rng = np.random.default_rng(13)
        g20 = random_seq(20, rng)
        g24 = random_seq(24, rng)
        rec, genome = build_case(
            seed=13, planted=[(g20, 700, dict(pam="TGG")), (g24, 3000, dict(pam="CGG"))]
        )
        lib = BarcodeLibrary.from_list([g20, g24])
        res = run_targets(lib, genome, "NGG", 0)
        assert (res.table[res.table.spacer == g20].tar_start == 700).any()
        assert (res.table[res.table.spacer == g24].tar_start == 3000).any()
        assert res.stats["spacer_len_range"] == "20,24"

    def test_stats_fields(self):
        rng = np.random.default_rng(14)
        g = random_seq(20, rng)
        rec, genome = build_case(seed=14, planted=[(g, 1200, dict(pam="AGG"))])
        lib = BarcodeLibrary.from_list([g])
        res = run_targets(lib, genome, "NGG", 0)
        s = res.stats
        assert s["chromosomes"] == 1
        assert s["total_genes"] == 8
        assert s["systematic_name"] == "20-NGG"
        assert s["unique_barcodes"] == 1


class TestMaxSitesCap:
    """--max-sites: the bowtie -k 100 reporting-cap parity switch
    (reference targets.py:502, BowtieRunner.py:111-125). Default (None)
    reports all hits; N keeps each spacer's best N sites genome-wide by
    (mismatches, contig order, pos, strand)."""

    def _dense_case(self):
        rng = np.random.default_rng(7)
        g = random_seq(20, rng)
        positions = [500 + 60 * i for i in range(8)]
        rec, genome = build_case(seed=7, planted=[
            (g, p, dict(pam="TGG")) for p in positions
        ])
        lib = BarcodeLibrary.from_list([g])
        return g, positions, genome, lib

    def test_cap_limits_sites_per_spacer(self):
        g, positions, genome, lib = self._dense_case()
        full = run_targets(lib, genome, "NGG", 0)
        n_full = full.results.tar_start.nunique()
        assert n_full >= 6  # dense-hit spacer (plant collisions may drop a couple)
        capped = run_targets(lib, genome, "NGG", 0, max_sites=3)
        assert capped.results.tar_start.nunique() == 3
        # kept sites are the best-ranked: v=0 ties break by position
        kept = sorted(capped.results.tar_start.unique())
        assert kept == sorted(full.results.tar_start.unique())[:3]

    def test_cap_prefers_low_mismatch_sites(self):
        rng = np.random.default_rng(8)
        g = random_seq(20, rng)
        mut = "A" + g[1:] if g[0] != "A" else "C" + g[1:]
        # exact site at a HIGHER position than the mismatch sites — the cap
        # must rank by mismatches first, not position
        rec, genome = build_case(seed=8, planted=[
            (mut, 500, dict(pam="AGG")),
            (mut, 700, dict(pam="CGG")),
            (g, 3000, dict(pam="TGG")),
        ])
        lib = BarcodeLibrary.from_list([g])
        capped = run_targets(lib, genome, "NGG", 1, max_sites=1)
        assert capped.results.tar_start.tolist() == [3000]
        assert capped.results.mismatches.tolist() == [0]

    def test_cap_larger_than_hits_is_identity(self):
        g, positions, genome, lib = self._dense_case()
        full = run_targets(lib, genome, "NGG", 0)
        capped = run_targets(lib, genome, "NGG", 0, max_sites=10_000)
        pd.testing.assert_frame_equal(
            full.results.reset_index(drop=True),
            capped.results.reset_index(drop=True),
        )


@pytest.mark.slow
def test_sharded_backend_full_pipeline_matches_jax():
    """run_targets through the multi-device engine (8-fake-device mesh)
    produces a byte-identical table to the XLA backend — the integration
    pin for `--backend sharded` / auto-on-multichip (ops.scan)."""
    rng = np.random.default_rng(21)
    planted = [(random_seq(20, rng), 700 + 900 * i, dict(pam="TGG")) for i in range(6)]
    rec, genome = build_case(seed=21, planted=planted, wrapped_gene=True)
    lib = BarcodeLibrary.from_list([g for g, _, _ in planted] + [random_seq(20, rng)])
    a = run_targets(lib, genome, "NGG", 1, backend="jax").table
    b = run_targets(lib, genome, "NGG", 1, backend="sharded").table
    pd.testing.assert_frame_equal(
        a.sort_values(list(a.columns)).reset_index(drop=True),
        b.sort_values(list(b.columns)).reset_index(drop=True),
    )


@pytest.mark.slow
def test_sharded_backend_multicontig_matches_jax():
    """A MULTI-replicon genome through the sharded backend's batched
    per-contig dispatch path (ops.scan.scan_contigs ->
    sharded_scan_contigs: every contig's fused program dispatched before
    any fetch) must match the XLA backend byte-for-byte."""
    rng = np.random.default_rng(31)
    recs = []
    guides = []
    for k in range(3):
        rec = make_record(n=6000 + 700 * k, topology="circular",
                          seed=31 + k, n_genes=4, rec_id=f"CTG{k}")
        g = random_seq(20, rng)
        plant_guide(rec, g, 800 + 400 * k, pam="TGG")
        guides.append(g)
        recs.append(rec)
    genome = genome_from_records(recs)
    assert len(genome.contigs) == 3
    lib = BarcodeLibrary.from_list(guides + [random_seq(20, rng)])
    a = run_targets(lib, genome, "NGG", 1, backend="jax").table
    b = run_targets(lib, genome, "NGG", 1, backend="sharded").table
    pd.testing.assert_frame_equal(
        a.sort_values(list(a.columns)).reset_index(drop=True),
        b.sort_values(list(b.columns)).reset_index(drop=True),
    )
    # every planted guide present on its own contig
    for k, g in enumerate(guides):
        assert (b[b["spacer"] == g]["chr"] == f"CTG{k}").any()


@pytest.mark.slow
def test_duplicate_contig_ids_scan_positionally():
    """Contigs with DUPLICATE ids (malformed but possible FASTA input) must
    each report their own hits — the batched scan path is positional, not
    id-keyed (the collision this test's first draft caught in review)."""
    rng = np.random.default_rng(33)
    recs, guides = [], []
    for k in range(2):
        rec = make_record(n=5000, topology="circular", seed=33 + k,
                          n_genes=3, rec_id="DUP.1")
        g = random_seq(20, rng)
        plant_guide(rec, g, 900 + 300 * k, pam="TGG")
        guides.append(g)
        recs.append(rec)
    genome = genome_from_records(recs)
    lib = BarcodeLibrary.from_list(guides)
    for backend in ("jax", "sharded"):
        t = run_targets(lib, genome, "NGG", 0, backend=backend).table
        for g in guides:
            assert (t["spacer"] == g).any(), (backend, g)


def test_empty_library_returns_empty_schema():
    """A zero-entry library (API path; the CLI loader rejects empty files
    earlier) must yield an empty schema'd table, not a KeyError (r5)."""
    from barcoder_tpu.core.genome import Genome, contig_from_record
    from barcoder_tpu.pipeline.targets import (
        filter_offtargets_by_pam,
        run_targets,
    )
    from barcoder_tpu.seqio.library import BarcodeLibrary

    from .genomes import make_record

    genome = Genome(contigs=[contig_from_record(make_record(n=3000, seed=1, n_genes=2))])
    tr = run_targets(BarcodeLibrary.from_list([]), genome, "NGG", 1)
    assert len(tr.table) == 0
    assert "spacer" in tr.table.columns
    # the standalone filter must also tolerate an empty frame
    import pandas as pd

    empty = pd.DataFrame(columns=["spacer", "target"])
    assert len(filter_offtargets_by_pam(empty)) == 0


def test_circular_contig_shorter_than_spacer_is_unmapped():
    """A circular contig shorter than the spacer has no self-consistent
    folded coordinates for the multi-wrap hits the engine can find (and
    the reference's bowtie path reports such reads unmapped) — the contig
    must be ineligible and the spacer come back non-targeting (r5
    review; linear sub-length contigs were already excluded)."""
    from barcoder_tpu.seqio.genbank import GenBankRecord

    from .genomes import genome_from_records

    tiny = GenBankRecord(id="TINY.1", name="TINY", seq="ACGTACGTAC",
                         topology="circular")
    spacer = "ACGTACGTAC" + "ACGTACGTAC"  # 20 nt > 10 bp contig
    lib = BarcodeLibrary.from_list([spacer])
    res = run_targets(lib, genome_from_records([tiny]), "", 0)
    assert len(res.table) == 1
    row = res.table.iloc[0]
    assert row.note == "non-targeting"
    assert pd.isna(row.tar_start)


def test_upstream_stats_use_promoter_window_map():
    """targets --gene_window upstream must report PROMOTER-WINDOW
    ambiguity (targets_in_upstream.py:786-807), not gene-body ambiguity
    (r5 review: stats always used the body map)."""
    from barcoder_tpu.seqio.genbank import Feature, GenBankRecord, Location

    from .genomes import genome_from_records

    rng = np.random.default_rng(31)
    rec = GenBankRecord(id="UP1.1", name="UP1", seq=random_seq(3000, rng),
                        topology="circular")
    # +strand genes: bodies disjoint, windows [295,595) and [445,745)
    rec.features = [
        Feature("gene", Location(500, 560, 1), {"locus_tag": ["A"]}),
        Feature("gene", Location(650, 710, 1), {"locus_tag": ["B"]}),
    ]
    genome = genome_from_records([rec])
    lib = BarcodeLibrary.from_list([random_seq(20, rng)])
    res_body = run_targets(lib, genome, "NGG", 0)
    res_up = run_targets(lib, genome, "NGG", 0, gene_window="upstream")
    assert res_body.stats["ambiguous_coordinates"] == 0
    assert res_body.stats["overlapping_genes"] == 0
    assert res_up.stats["ambiguous_coordinates"] == 150
    assert res_up.stats["overlapping_genes"] == 2
