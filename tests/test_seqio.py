import gzip
import io

import pytest

from barcoder_tpu.seqio.fasta import (
    iter_fastq,
    iter_read_chunks,
    read_barcode_fasta,
    read_fasta,
    write_fasta,
    write_fastq,
)
from barcoder_tpu.seqio.genbank import (
    CompoundLocation,
    format_location,
    parse_genbank,
    parse_location,
    to_genbank_string,
)
from barcoder_tpu.seqio.library import BarcodeLibrary, BarcodeLibraryError
from barcoder_tpu.seqio.snapgene import parse_snapgene

from .genomes import make_record

REF_SNAPGENE = "/root/reference/GCA_003054575.1/CP023716.dna"


class TestLocations:
    def test_simple(self):
        loc = parse_location("190..255")
        assert (loc.start, loc.end, loc.strand) == (189, 255, 1)

    def test_complement(self):
        loc = parse_location("complement(5683..6459)")
        assert (loc.start, loc.end, loc.strand) == (5682, 6459, -1)

    def test_join_wrap(self):
        loc = parse_location("join(19000..20000,1..80)")
        assert isinstance(loc, CompoundLocation)
        assert [(p.start, p.end) for p in loc.parts] == [(18999, 20000), (0, 80)]
        assert loc.strand == 1

    def test_complement_join(self):
        loc = parse_location("complement(join(10..20,30..40))")
        assert isinstance(loc, CompoundLocation)
        # biological order reversed, strand -1 on all parts
        assert [(p.start, p.end, p.strand) for p in loc.parts] == [
            (29, 40, -1),
            (9, 20, -1),
        ]

    def test_partial_markers(self):
        loc = parse_location("<1..206")
        assert (loc.start, loc.end) == (0, 206)

    def test_format_roundtrip(self):
        for text in ["190..255", "complement(5683..6459)", "join(100..200,300..400)"]:
            assert format_location(parse_location(text)) == text


class TestGenBankRoundtrip:
    def test_roundtrip(self):
        rec = make_record(n=2000, n_genes=4, wrapped_gene=True)
        text = to_genbank_string([rec])
        back = parse_genbank(io.StringIO(text))
        assert len(back) == 1
        b = back[0]
        assert b.id == rec.id
        assert b.seq == rec.seq
        assert b.topology == "circular"
        assert b.organism == rec.organism
        genes = [f for f in b.features if f.type == "gene"]
        assert len(genes) == 5
        assert genes[0].qualifier("locus_tag") == "TST_0000"
        wrapped = [f for f in genes if isinstance(f.location, CompoundLocation)]
        assert len(wrapped) == 1
        assert wrapped[0].location.parts[0].end == 2000

    def test_multi_record(self):
        recs = [make_record(n=500, seed=i, rec_id=f"R{i}.1") for i in range(3)]
        back = parse_genbank(io.StringIO(to_genbank_string(recs)))
        assert [r.id for r in back] == ["R0.1", "R1.1", "R2.1"]

    def test_gzip(self, tmp_path):
        rec = make_record(n=300)
        path = tmp_path / "g.gb.gz"
        with gzip.open(path, "wt") as fh:
            fh.write(to_genbank_string([rec]))
        back = parse_genbank(str(path))
        assert back[0].seq == rec.seq


class TestSnapGene:
    def test_reference_contig(self):
        rec = parse_snapgene(REF_SNAPGENE)
        assert rec.topology == "circular"
        assert 30_000 < len(rec.seq) < 40_000
        assert set(rec.seq) <= set("ACGTN")
        assert len(rec.features) > 10
        genes = [f for f in rec.features if f.type == "gene"]
        assert genes, "expected gene features in SnapGene XML"
        # features carry usable locations
        f = rec.features[0]
        assert 0 <= f.location.start < f.location.end <= len(rec.seq)


class TestFasta:
    def test_fasta_roundtrip(self, tmp_path):
        path = tmp_path / "x.fasta"
        write_fasta([("a", "ACGT" * 30), ("b", "some desc", "TTTT")], path)
        recs = read_fasta(str(path))
        assert recs[0][0] == "a" and recs[0][2] == "ACGT" * 30
        assert recs[1][0] == "b" and "some desc" in recs[1][1]

    def test_fastq(self, tmp_path):
        path = tmp_path / "x.fastq"
        write_fastq([("r1", "ACGT")], path, quality=40)
        recs = list(iter_fastq(str(path)))
        assert recs == [("r1", "ACGT", "IIII")]

    def test_barcode_fasta(self, tmp_path):
        path = tmp_path / "bc.fasta"
        path.write_text(">a\nACGT\n>b\nTTTT\n")
        assert read_barcode_fasta(str(path)) == {"ACGT", "TTTT"}
        with pytest.raises(ValueError):
            read_barcode_fasta(str(tmp_path / "bc.txt"))

    def test_read_chunks_paired(self, tmp_path):
        f1 = tmp_path / "r1.fastq"
        f2 = tmp_path / "r2.fastq"
        write_fastq([(f"r{i}", "ACGT") for i in range(5)], f1, quality=30)
        write_fastq([(f"r{i}", "TGCA") for i in range(5)], f2, quality=30)
        chunks = list(iter_read_chunks(str(f1), str(f2), chunk_size=2))
        assert [len(c[0]) for c in chunks] == [2, 2, 1]
        assert chunks[0][1] == ["TGCA", "TGCA"]

    def test_read_chunks_reads_format(self, tmp_path):
        f1 = tmp_path / "x.reads"
        f1.write_text("AAAA\nCCCC\nGGGG\n")
        chunks = list(iter_read_chunks(str(f1), chunk_size=10))
        assert chunks == [(["AAAA", "CCCC", "GGGG"], None)]


class TestLibrary:
    def test_from_tsv(self, tmp_path):
        path = tmp_path / "lib.tsv"
        path.write_text("spacer\tgene\nACGT\tg1\nTTTT\tg2\nACGT\tg3\n")
        lib = BarcodeLibrary.from_tsv(str(path), "spacer")
        assert lib.barcodes == {"ACGT", "TTTT"}
        assert lib.size == 2
        assert len(lib.entries) == 3

    def test_missing_column(self, tmp_path):
        path = tmp_path / "lib.tsv"
        path.write_text("a\tb\nx\ty\n")
        with pytest.raises(BarcodeLibraryError):
            BarcodeLibrary.from_tsv(str(path), "spacer")

    def test_from_fasta_names(self, tmp_path):
        path = tmp_path / "lib.fasta"
        write_fasta([("g1", "ACGTACGT"), ("g2", "ACGTACGT")], path)
        lib = BarcodeLibrary.from_fasta(str(path))
        assert lib.size == 1
        assert len(lib.entries) == 2

    def test_reference_library(self):
        lib = BarcodeLibrary.from_tsv(
            "/root/reference/Example_Libraries/CN-32-zmo.tsv", "spacer"
        )
        assert len(lib.entries) == 9817
        assert lib.lengths() == {32}


def test_snapgene_gz_roundtrip(tmp_path):
    """Genome.load dispatches '*.dna.gz' to the SnapGene parser, which
    must actually decompress it (r5 review: the raw bytes were fed to the
    segment parser). Record id must also drop the .gz suffix."""
    import gzip

    from barcoder_tpu.core.genome import Genome

    gz = tmp_path / "CP023716.dna.gz"
    gz.write_bytes(gzip.compress(open(REF_SNAPGENE, "rb").read()))
    plain = Genome.load(REF_SNAPGENE)
    packed = Genome.load(str(gz))
    assert [c.id for c in packed.contigs] == [c.id for c in plain.contigs]
    assert packed.contigs[0].seq == plain.contigs[0].seq
    assert packed.contigs[0].topology == plain.contigs[0].topology
    assert packed.contigs[0].gene_count == plain.contigs[0].gene_count


class TestSeqioEdges:
    """r5 review pins: format edge cases across the seqio layer."""

    def test_snapgene_dir_with_gz(self, tmp_path):
        import gzip

        from barcoder_tpu.seqio.snapgene import read_snapgene_dir

        (tmp_path / "a.dna.gz").write_bytes(
            gzip.compress(open(REF_SNAPGENE, "rb").read())
        )
        recs = read_snapgene_dir(str(tmp_path))
        assert len(recs) == 1 and len(recs[0].seq) > 30_000

    def test_parse_sam_empty_keeps_schema(self):
        from barcoder_tpu.seqio.sam import parse_sam

        df = parse_sam(["@HD\tVN:1.6\n", "@SQ\tSN:c1\tLN:100\n"])
        assert list(df.columns) == [
            "Chromosome", "Start", "End", "Mapped", "Strand", "Barcode",
            "Mismatches",
        ]
        assert len(df) == 0

    def test_parse_sam_blank_and_short_lines(self):
        from barcoder_tpu.seqio.sam import parse_sam

        ok = ("q\t0\tc1\t5\t255\t4M\t*\t0\t0\tACGT\tIIII\tNM:i:1\n")
        df = parse_sam(["\n", ok])
        assert len(df) == 1 and df.Mismatches[0] == 1
        with pytest.raises(ValueError, match="malformed SAM"):
            parse_sam(["q\t0\tc1\n"])

    def test_mixed_strand_location_roundtrip(self):
        from barcoder_tpu.seqio.genbank import format_location, parse_location

        text = "join(complement(1..5),8..10)"
        loc = parse_location(text)
        out = format_location(loc)
        assert parse_location(out).parts == loc.parts
        assert "complement(1..5)" in out and "8..10" in out

    def test_paired_chunks_stop_at_mate_eof(self, tmp_path):
        from barcoder_tpu.seqio.fasta import iter_read_chunks

        f1, f2 = tmp_path / "r1.fastq", tmp_path / "r2.fastq"
        f1.write_text("".join(f"@r{i}\nACGT\n+\nIIII\n" for i in range(10)))
        f2.write_text("".join(f"@r{i}\nTTTT\n+\nIIII\n" for i in range(6)))
        chunks = list(iter_read_chunks(str(f1), str(f2), chunk_size=4))
        r1 = [r for c, _ in chunks for r in c]
        r2 = [r for _, c in chunks for r in c]
        assert len(r1) == len(r2) == 6  # min(10, 6), no '' padding
        assert all(r == "TTTT" for r in r2)

    def test_fastq_crlf_and_fasta_blank_desc(self, tmp_path):
        from barcoder_tpu.seqio.fasta import iter_fastq, read_fasta, write_fasta

        fq = tmp_path / "crlf.fastq"
        fq.write_bytes(b"@r1 extra\r\nACGT\r\n+\r\nIIII\r\n")
        (name, seq, qual), = list(iter_fastq(str(fq)))
        assert (name, seq, qual) == ("r1 extra", "ACGT", "IIII")

        fa = tmp_path / "o.fasta"
        write_fasta([("id1", " ", "ACGT")], str(fa))  # must not raise
        assert read_fasta(str(fa))[0][0] == "id1"

    def test_library_load_compressed_variants(self, tmp_path):
        import gzip

        from barcoder_tpu.seqio.library import BarcodeLibrary

        fq = tmp_path / "lib.fq.gz"
        fq.write_bytes(gzip.compress(b"@b1\nACGTACGTAC\n+\nIIIIIIIIII\n"))
        lib = BarcodeLibrary.load(str(fq))
        assert lib.barcodes == {"ACGTACGTAC"}
        fa = tmp_path / "lib.fa.gz"
        fa.write_bytes(gzip.compress(b">b1\nACGTACGTAC\n"))
        assert BarcodeLibrary.load(str(fa)).barcodes == {"ACGTACGTAC"}
