"""Class-API layer: the testing_grounds.py flow end-to-end
(GenBank → GuideFinder → ScanRunner → feature join → CRISPRiLibrary)."""

import numpy as np
import pytest

from barcoder_tpu.api import CRISPRiLibrary, GuideFinder, PAMFinder, ScanRunner
from barcoder_tpu.seqio.library import BarcodeLibrary

from .genomes import genome_from_records, make_record, plant_guide, random_seq


@pytest.fixture(scope="module")
def genome():
    rec = make_record(n=9000, topology="circular", seed=50, n_genes=6)
    return genome_from_records([rec])


class TestGuideFinder:
    def test_finds_guides(self, genome):
        gf = GuideFinder(genome, "GG", "downstream", 20)
        guides = gf.find_guides_from_pam()
        assert len(guides) > 100
        # guides precede a GG on some strand
        seq = genome.contigs[0].seq
        from barcoder_tpu.core.encode import revcomp

        g = next(x for x in guides if len(x) == 20)
        assert g in seq or g in revcomp(seq)


class TestGuideFinderEquivalence:
    def test_matches_regex_reference_semantics(self, genome):
        """The vectorized match search must replicate re.finditer exactly:
        non-overlapping left-to-right matches, truncated edge guides."""
        import re

        from barcoder_tpu.core.encode import revcomp

        for pam, direction, length in [
            ("GG", "downstream", 20),
            ("NGG", "downstream", 12),
            ("TTN", "upstream", 15),
        ]:
            gf = GuideFinder(genome, pam, direction, length)
            got = gf.find_guides_from_pam()
            pat = re.compile(pam.replace("N", "[ATCG]"))
            want = []
            for contig in genome.contigs:
                for seq in (contig.seq, revcomp(contig.seq)):
                    for m in pat.finditer(seq):
                        if direction == "downstream":
                            want.append(seq[max(0, m.start() - length) : m.start()])
                        else:
                            want.append(seq[m.end() : m.end() + length])
            assert got == want, (pam, direction)

    def test_bad_direction_raises(self, genome):
        with pytest.raises(ValueError):
            GuideFinder(genome, "GG", "sideways", 20)


class TestScanRunner:
    def test_align_frame_schema(self, genome):
        rng = np.random.default_rng(51)
        g = random_seq(20, rng)
        rec = genome.contigs[0]
        lib = BarcodeLibrary.from_list([g, rec.seq[100:120]])
        with ScanRunner(genome) as runner:
            df = runner.align(sorted(lib.barcodes), num_mismatches=0)
        assert set(df.columns) == {
            "Chromosome", "Start", "End", "Mapped", "Strand", "Barcode", "Mismatches",
        }
        hit = df[(df.Barcode == rec.seq[100:120]) & df.Mapped]
        assert (hit.Start == 100).any()

    def test_join_features(self, genome):
        rec = genome.contigs[0]
        # guide inside gene 1 (genes at i*1500, len 750)
        g = rec.seq[1600:1620]
        with ScanRunner(genome) as runner:
            joined = runner.align([g], num_mismatches=0, join_features=True)
        gene_rows = joined[joined.Type == "gene"]
        assert (gene_rows.Locus_Tag == "TST_0001").any()
        src_rows = joined[joined.Type == "source"]
        assert len(src_rows) >= 1


class TestJoinFeaturesEquivalence:
    def test_matches_bruteforce_pairs(self, genome):
        """Every (alignment, feature) overlap pair exactly once, with the
        feature columns of that pair — checked against an O(n*m) join."""
        rec = genome.contigs[0]
        guides = [rec.seq[s : s + 20] for s in (0, 1495, 1600, 2200, 8980)]
        with ScanRunner(genome) as runner:
            adf = runner.align(guides, num_mismatches=0)
            joined = runner.join_features(adf)
            feats = runner.feature_frame()
        want = set()
        for _, ar in adf[adf.Mapped].iterrows():
            for _, fr in feats[feats.Chromosome == ar.Chromosome].iterrows():
                if fr.Start < ar.End and fr.End > ar.Start:
                    want.add(
                        (ar.Barcode, ar.Start, ar.Strand, fr.Start, fr.End, fr.Type)
                    )
        got = set(
            map(
                tuple,
                joined[
                    ["Barcode", "Start", "Strand", "Start_b", "End_b", "Type"]
                ].itertuples(index=False),
            )
        )
        assert got == want
        assert len(joined) == sum(
            1
            for _, ar in adf[adf.Mapped].iterrows()
            for _, fr in feats[feats.Chromosome == ar.Chromosome].iterrows()
            if fr.Start < ar.End and fr.End > ar.Start
        )


class TestCRISPRiLibrary:
    def test_full_flow(self, genome):
        rec = genome.contigs[0]
        # guides: one unique inside gene 2 with GG context, one duplicated
        g_unique = rec.seq[3010:3030]
        with ScanRunner(genome) as runner:
            joined = runner.align([g_unique], num_mismatches=0, join_features=True)
        pf = PAMFinder(genome, "NN", "downstream")  # permissive PAM
        lib = CRISPRiLibrary(joined, pf)
        assert len(lib.source_unique_targets) >= 1
        mapped = lib.mapped_targets
        assert "Offset" in mapped.columns and "Overlap" in mapped.columns
        row = mapped[mapped.Locus_Tag == "TST_0002"].iloc[0]
        assert row.Offset == 3010 - 3000
        assert row.Overlap == 20
        assert len(lib.unique_targets) >= 1
        assert len(lib.unambiguous_targets) >= 1

    def test_pam_annotation_matches_rowwise_extraction(self, genome):
        """The bulk PAM gather (incl. minus strand and truncated boundary
        windows) must equal PAMFinder.get_pam_seq row by row."""
        rec = genome.contigs[0]
        from barcoder_tpu.core.encode import revcomp

        n = rec.length
        guides = [
            rec.seq[100:120],
            revcomp(rec.seq[300:320]),  # minus-strand hit
            rec.seq[n - 20 :],  # window truncated at the right edge (+)
            revcomp(rec.seq[:20]),  # window truncated at the left edge (-)
        ]
        with ScanRunner(genome) as runner:
            joined = runner.align(guides, num_mismatches=0, join_features=True)
        pf = PAMFinder(genome, "NGG", "downstream")
        lib = CRISPRiLibrary(joined, pf)
        assert {"+", "-"} <= set(lib.targets_df.Strand)
        for _, row in lib.targets_df.iterrows():
            assert row.PAM == pf.get_pam_seq(row), (row.Barcode, row.Strand)
            assert row.Targeting == pf.pam_matches(row.PAM)

    def test_offset_overlap_vectorized(self, genome):
        """Offset/Overlap columns equal the reference formulas row-wise."""
        rec = genome.contigs[0]
        g = rec.seq[1495:1515]  # straddles the gene-1 start at 1500
        with ScanRunner(genome) as runner:
            joined = runner.align([g], num_mismatches=0, join_features=True)
        pf = PAMFinder(genome, "NN", "downstream")
        lib = CRISPRiLibrary(joined, pf)
        for _, row in lib.mapped_targets.iterrows():
            want_off = {"+": row.Start - row.Start_b, "-": row.End_b - row.End}.get(
                row.Strand_b
            )
            want_ovl = max(min(row.End, row.End_b) - max(row.Start, row.Start_b), 0)
            assert row.Offset == want_off
            assert row.Overlap == want_ovl


def test_pam_finder_strand_normalization():
    """Reference get_strand semantics (PAMProcessor.py:16-24): 'fwd' and
    'forward' are PLUS strand, unrecognized symbols raise — silently
    treating them as minus produced wrong-window PAM annotations (r5
    review)."""
    from barcoder_tpu.api import PAMFinder

    assert PAMFinder.get_strand("fwd") == 1
    assert PAMFinder.get_strand("Forward") == 1
    assert PAMFinder.get_strand("+1") == 1
    assert PAMFinder.get_strand("rev") == -1
    assert PAMFinder.get_strand(-1) == -1
    with pytest.raises(ValueError, match="Unrecognized"):
        PAMFinder.get_strand(".")


def test_pam_finder_negative_slice_quirk(genome):
    """Minus-strand PAM window with Start < pam_length: the reference's
    negative Python slice returns '' (PAMProcessor.py:73-75) — not a
    truncated window (r5 review)."""
    from types import SimpleNamespace

    from barcoder_tpu.api import PAMFinder

    pf = PAMFinder(genome, "NGG", "downstream")
    chrom = genome.contigs[0].id
    row = SimpleNamespace(Chromosome=chrom, Start=2, End=22, Strand="-")
    assert pf.get_pam_seq(row) == ""


def test_align_empty_and_unmapped_join_schema(genome):
    """align([]) and a nothing-overlaps join must return SCHEMA'D empty
    frames — a columnless DataFrame crashed CRISPRiLibrary and
    align_df.Mapped itself (r5 review)."""
    from barcoder_tpu.api import ScanRunner

    with ScanRunner(genome, backend="jax") as runner:
        df = runner.align([], join_features=True)
    assert list(df.columns[:7]) == [
        "Chromosome", "Start", "End", "Mapped", "Strand", "Barcode",
        "Mismatches",
    ]
    assert "Locus_Tag" in df.columns and len(df) == 0


def test_join_features_includes_source_and_genes(genome):
    """The split source/gene join (r5 review: contig-spanning source rows
    degenerated the searchsorted window to a quadratic pair sweep) must
    still pair every mapped alignment with its source row AND its
    overlapping genes."""
    from barcoder_tpu.api import ScanRunner

    contig = genome.contigs[0]
    # a guide inside the first gene's body
    e = contig.locus_entries[0]
    guide = contig.seq[e.start : e.start + 20]
    with ScanRunner(genome, backend="jax") as runner:
        df = runner.align([guide], num_mismatches=0, join_features=True)
    mine = df[df.Barcode == guide]
    assert (mine.Type == "source").sum() >= 1
    gene_rows = mine[mine.Type == "gene"]
    assert (gene_rows.Locus_Tag == e.locus_tag).any()
