"""Synthetic-genome helpers for tests and benchmarks.

The reference snapshot ships no GenBank genomes (stripped as large blobs,
SURVEY.md §7 "Missing data"), so tests synthesize random genomes with planted
guides/PAMs and GenBank feature tables via the framework's own writer.
"""

from __future__ import annotations

import numpy as np

from barcoder_tpu.core.encode import decode, revcomp
from barcoder_tpu.core.genome import Genome, contig_from_record
from barcoder_tpu.seqio.genbank import CompoundLocation, Feature, GenBankRecord, Location


def random_seq(n: int, rng: np.random.Generator) -> str:
    return decode(rng.integers(0, 4, size=n).astype(np.int8))


def make_record(
    n: int = 20_000,
    topology: str = "circular",
    n_genes: int = 10,
    seed: int = 0,
    rec_id: str = "TEST0.1",
    organism: str = "Testus syntheticus",
    wrapped_gene: bool = False,
) -> GenBankRecord:
    rng = np.random.default_rng(seed)
    seq = random_seq(n, rng)
    rec = GenBankRecord(
        id=rec_id,
        name=rec_id.split(".")[0],
        description=f"synthetic {topology} test genome",
        seq=seq,
        topology=topology,
        organism=organism,
    )
    gene_len = max(60, n // (n_genes * 2))
    for i in range(n_genes):
        start = (i * n) // n_genes
        end = min(start + gene_len, n)
        strand = 1 if i % 2 == 0 else -1
        loc = Location(start, end, strand)
        rec.features.append(
            Feature(
                "gene",
                loc,
                {"locus_tag": [f"TST_{i:04d}"], "gene": [f"gen{i}"] if i % 3 == 0 else []},
            )
        )
    if wrapped_gene and topology == "circular":
        # origin-spanning gene: join(n-120..n, 1..80) like the reference's
        # CompoundLocation case (targets.py:102-128)
        loc = CompoundLocation([Location(n - 120, n, 1), Location(0, 80, 1)])
        rec.features.append(
            Feature("gene", loc, {"locus_tag": ["TST_WRAP"], "gene": ["wrp"]})
        )
    return rec


def plant(rec: GenBankRecord, seq: str, pos: int) -> None:
    """Overwrite rec.seq at pos with seq (wrapping if circular)."""
    n = len(rec.seq)
    s = list(rec.seq)
    for i, ch in enumerate(seq):
        s[(pos + i) % n] = ch
    rec.seq = "".join(s)


def plant_guide(
    rec: GenBankRecord,
    guide: str,
    pos: int,
    pam: str = "",
    strand: str = "F",
    pam_direction: str = "downstream",
) -> None:
    """Plant a guide with its PAM context so [pos, pos+len) matches on the
    requested strand."""
    L = len(guide)
    if strand == "F":
        plant(rec, guide, pos)
        if pam:
            at = pos + L if pam_direction == "downstream" else pos - len(pam)
            plant(rec, pam, at % len(rec.seq))
    else:
        plant(rec, revcomp(guide), pos)
        if pam:
            at = pos - len(pam) if pam_direction == "downstream" else pos + L
            plant(rec, revcomp(pam), at % len(rec.seq))


def genome_from_records(records) -> Genome:
    return Genome([contig_from_record(r) for r in records], source="synthetic")
