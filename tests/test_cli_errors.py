"""Top-level CLI error-handling parity (VERDICT r3 item 3): user-input
errors — missing files, bad library columns — produce a friendly message and
exit code 1, never a raw traceback (reference: targets.py:703-712; the count
CLI already had the equivalent, cli/count.py)."""

import numpy as np
import pytest

from barcoder_tpu.cli import design as design_cli
from barcoder_tpu.cli import mismatch as mismatch_cli
from barcoder_tpu.cli import targets as targets_cli
from barcoder_tpu.seqio.genbank import write_genbank
from barcoder_tpu.seqio.library import BarcodeLibrary

from .genomes import make_record, plant_guide, random_seq


@pytest.fixture(scope="module")
def small_case(tmp_path_factory):
    d = tmp_path_factory.mktemp("clierr")
    rng = np.random.default_rng(5)
    rec = make_record(n=4000, topology="circular", seed=11, n_genes=4)
    g = random_seq(20, rng)
    plant_guide(rec, g, 700, pam="TGG")
    write_genbank([rec], d / "genome.gb")
    with open(d / "lib.fasta", "w") as fh:
        fh.write(f">g1\n{g}\n")
    with open(d / "lib.tsv", "w") as fh:
        fh.write("name\tsequence\ng1\t" + g + "\n")
    return d, g


def test_targets_missing_library(small_case, capsys):
    d, _ = small_case
    rc = targets_cli.main([str(d / "nope.fasta"), str(d / "genome.gb"), "NGG", "0"])
    assert rc == 1
    assert "nope.fasta" in capsys.readouterr().err


def test_targets_missing_genome(small_case, capsys):
    d, _ = small_case
    rc = targets_cli.main([str(d / "lib.fasta"), str(d / "nope.gb"), "NGG", "0"])
    assert rc == 1
    assert "nope.gb" in capsys.readouterr().err


def test_targets_bad_library_column(small_case, capsys):
    d, _ = small_case
    rc = targets_cli.main(
        [str(d / "lib.tsv"), str(d / "genome.gb"), "NGG", "0",
         "--library-column", "spacer"]
    )
    assert rc == 1
    err = capsys.readouterr().err
    assert "spacer" in err and "Traceback" not in err


def test_design_missing_genome(tmp_path, capsys):
    rc = design_cli.main([str(tmp_path / "nope.gb"), "NGG", "20"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "nope.gb" in err and "Traceback" not in err


def test_mismatch_missing_parameters(tmp_path, capsys):
    sp = tmp_path / "sp.tsv"
    sp.write_text("target\nACGTACGTACGTACGTACGT\n")
    rc = mismatch_cli.main(
        ["mismatches", "--spacers_file", str(sp),
         "--parameters_file", str(tmp_path / "nope.csv")]
    )
    assert rc == 1
    assert "nope.csv" in capsys.readouterr().err


def test_mismatch_missing_spacers_file(tmp_path, capsys):
    # hermetic minimal parameters file (same schema as the reference's
    # mismatch_parameters.csv) so the spacers file is the FIRST miss
    params = tmp_path / "params.csv"
    params.write_text(
        "feature,weight,Std error\nintercept,-0.06,0.03\nGC_content,0.5,0.03\n"
        + "".join(f"{i},0.7,0.03\n" for i in range(20))
    )
    rc = mismatch_cli.main(
        ["mismatches", "--spacers_file", str(tmp_path / "nope.tsv"),
         "--parameters_file", str(params)]
    )
    assert rc == 1
    assert "nope.tsv" in capsys.readouterr().err


def test_distill_missing_file(tmp_path, capsys):
    from barcoder_tpu.cli import distill as distill_cli

    rc = distill_cli.main([str(tmp_path / "nope.fastq")])
    assert rc == 1
    err = capsys.readouterr().err
    assert "nope.fastq" in err and "Traceback" not in err


def test_distill_bad_gzip(tmp_path, capsys):
    bad = tmp_path / "corrupt.fastq.gz"
    bad.write_bytes(b"\x1f\x8bthis is not a gzip stream")
    from barcoder_tpu.cli import distill as distill_cli

    rc = distill_cli.main([str(bad)])
    assert rc == 1
    assert "Traceback" not in capsys.readouterr().err


@pytest.mark.slow
def test_design_sgrna_out_roundtrip(small_case, tmp_path, capsys):
    """--sgrna-out persists the enumerated candidate library as FASTA
    (reference's durable sgRNA.fasta, design_guides.py:53-56,82) and the
    file round-trips through BarcodeLibrary.load."""
    d, _ = small_case
    out = tmp_path / "sgRNA.fasta"
    rc = design_cli.main(
        [str(d / "genome.gb"), "NGG", "20", "--keep-top", "2",
         "--sgrna-out", str(out)]
    )
    assert rc == 0
    lib = BarcodeLibrary.load(str(out))
    assert len(lib.barcodes) > 50
    assert all(len(b) == 20 for b in lib.barcodes)


def test_mismatch_malformed_and_missing_column(tmp_path, capsys):
    """Malformed inputs (pandas ParserError) and a missing 'target'
    column must hit the styled-message-exit-1 path, never a raw
    traceback or a raised SystemExit (r5 review; reference wraps its
    read_csv in except-Exception, mismatch.py:123-144)."""
    params = tmp_path / "params.csv"
    params.write_text(
        "feature,weight,Std error\nintercept,-0.06,0.03\nGC_content,0.5,0.03\n"
        + "".join(f"{i},0.7,0.03\n" for i in range(20))
    )
    ragged = tmp_path / "ragged.tsv"
    ragged.write_text('a\tb\n1\t2\t3\t"unclosed\n')
    rc = mismatch_cli.main(
        ["recalculate", "--existing_mismatches", str(ragged),
         "--parameters_file", str(params)]
    )
    assert rc == 1
    assert "Traceback" not in capsys.readouterr().err

    no_target = tmp_path / "sp.tsv"
    no_target.write_text("spacer\nACGTACGTACGTACGTACGT\n")
    rc = mismatch_cli.main(
        ["mismatches", "--spacers_file", str(no_target),
         "--parameters_file", str(params)]
    )
    assert rc == 1
    err = capsys.readouterr().err
    assert "target" in err and "Traceback" not in err
