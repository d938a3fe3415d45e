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
