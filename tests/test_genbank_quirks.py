"""GenBank parser robustness on real-world formatting quirks."""

import io

from barcoder_tpu.seqio.genbank import parse_genbank, parse_location

GB_QUIRKS = """\
LOCUS       QUIRK1                 120 bp    DNA     circular BCT 01-JAN-2000
DEFINITION  A record with tricky qualifiers and
            a wrapped definition line.
ACCESSION   QUIRK1
VERSION     QUIRK1.2
SOURCE      Testus quirkus
  ORGANISM  Testus quirkus
            Bacteria; Testales.
FEATURES             Location/Qualifiers
     source          1..120
                     /organism="Testus quirkus"
                     /mol_type="genomic DNA"
     gene            5..40
                     /locus_tag="Q_0001"
                     /gene="quirA"
                     /note="a note that wraps across
                     two lines with spaces"
                     /pseudo
     CDS             5..40
                     /locus_tag="Q_0001"
                     /translation="MKLVVNWVVLL
                     TTTGGG"
     gene            complement(join(50..70,80..100))
                     /locus_tag="Q_0002"
     gene            join(110..120,1..10)
                     /locus_tag="Q_WRAP"
ORIGIN
        1 acgtacgtac gtacgtacgt acgtacgtac gtacgtacgt acgtacgtac gtacgtacgt
       61 tgcatgcatg catgcatgca tgcatgcatg catgcatgca tgcatgcatg catgcatgca
//
"""


def test_quirky_record():
    recs = parse_genbank(io.StringIO(GB_QUIRKS))
    assert len(recs) == 1
    r = recs[0]
    assert r.id == "QUIRK1.2"
    assert r.topology == "circular"
    assert r.organism == "Testus quirkus"
    assert "wrapped definition line" in r.description
    assert len(r.seq) == 120

    genes = [f for f in r.features if f.type == "gene"]
    assert len(genes) == 3
    g1 = genes[0]
    assert g1.qualifier("locus_tag") == "Q_0001"
    assert g1.qualifier("gene") == "quirA"
    assert "two lines with spaces" in g1.qualifier("note")
    assert g1.qualifier("pseudo") == ""  # flag qualifier

    cds = [f for f in r.features if f.type == "CDS"][0]
    # /translation continuation joins without spaces
    assert cds.qualifier("translation") == "MKLVVNWVVLLTTTGGG"

    g2 = genes[1]
    assert g2.location.strand == -1
    assert [(p.start, p.end) for p in g2.location.parts] == [(79, 100), (49, 70)]

    wrap = genes[2]
    assert [(p.start, p.end) for p in wrap.location.parts] == [(109, 120), (0, 10)]


def test_location_edge_syntax():
    loc = parse_location("123")
    assert (loc.start, loc.end) == (122, 123)
    loc = parse_location("123^124")
    assert (loc.start, loc.end) == (122, 123)
    loc = parse_location("<5..>50")
    assert (loc.start, loc.end) == (4, 50)
