"""SAM writer/reader round trip (reference dialect: PySamParser.py:21-52)."""

import io

import numpy as np
import pandas as pd

from barcoder_tpu.api import ScanRunner
from barcoder_tpu.core.encode import revcomp
from barcoder_tpu.seqio.sam import parse_sam, write_sam

from .genomes import genome_from_records, make_record, random_seq


def test_roundtrip_align_frame():
    rec = make_record(n=5000, topology="circular", seed=77, n_genes=3)
    genome = genome_from_records([rec])
    rng = np.random.default_rng(7)
    guides = [
        rec.seq[200:220],            # forward hit
        revcomp(rec.seq[900:920]),   # reverse-strand hit
        random_seq(20, rng),         # unmapped
    ]
    with ScanRunner(genome) as runner:
        df = runner.align(guides, num_mismatches=1)
    buf = io.StringIO()
    write_sam(df, buf, seq_lens=genome.seq_lens)
    text = buf.getvalue()
    assert text.startswith("@HD\t")
    assert f"@SQ\tSN:{rec.id}\tLN:{len(rec.seq)}" in text
    back = parse_sam(io.StringIO(text))
    # column-for-column equality with the original align frame
    a = df.reset_index(drop=True)
    b = back[a.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # reverse-strand SEQ is stored reference-forward in the SAM text
    rev_line = next(
        l for l in text.splitlines() if not l.startswith("@") and l.split("\t")[1] == "16"
    )
    assert rev_line.split("\t")[9] == revcomp(rev_line.split("\t")[0])


def test_sam_fields_bowtie_dialect():
    df = pd.DataFrame(
        [
            dict(Chromosome="C1", Start=9, End=29, Mapped=True, Strand="+",
                 Barcode="A" * 20, Mismatches=2),
            dict(Chromosome=None, Start=-1, End=-1, Mapped=False, Strand=".",
                 Barcode="C" * 20, Mismatches=0),
        ]
    )
    buf = io.StringIO()
    write_sam(df, buf, seq_lens={"C1": 100})
    lines = [l for l in buf.getvalue().splitlines() if not l.startswith("@")]
    f = lines[0].split("\t")
    assert f[1] == "0" and f[2] == "C1" and f[3] == "10"  # 1-based POS
    assert f[4] == "255" and f[5] == "20M" and f[10] == "I" * 20
    assert f[11] == "NM:i:2"
    u = lines[1].split("\t")
    assert u[1] == "4" and u[2] == "*" and u[3] == "0" and u[5] == "*"


def test_align_sam_path_export(tmp_path):
    rec = make_record(n=3000, topology="linear", seed=5, n_genes=2)
    genome = genome_from_records([rec])
    out = tmp_path / "aln.sam"
    with ScanRunner(genome) as runner:
        df = runner.align([rec.seq[50:70]], num_mismatches=0, sam_path=str(out))
    back = parse_sam(out.read_text().splitlines())
    assert (back.Barcode == rec.seq[50:70]).all()
    assert len(back) == len(df)
