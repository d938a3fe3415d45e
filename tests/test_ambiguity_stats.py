"""Genome.ambiguity_stats pinned against a dict-based port of the
reference's computation (locus_map keys with >1 entry, folded;
targets.py:76-165 key construction + :788-797 stat) — including the
reference's ORDER-DEPENDENT overhang duplication quirk: a gene earlier in
the file than a wrapped gene duplicates into the wrapped gene's unfolded
keys and collides; a later one does not."""

import numpy as np

from barcoder_tpu.core.genome import Genome, contig_from_record
from barcoder_tpu.seqio.genbank import CompoundLocation, Feature, GenBankRecord, Location

from .genomes import make_record, random_seq


def reference_ambiguity(contig) -> tuple[int, set]:
    """Direct port of create_locus_map's key construction (overhang dup with
    overhang_continue, wrapped adj keys) + the ambiguous-set stat."""
    length = contig.length
    overhang = 100_000 if contig.circular else 0
    locus_map: dict[int, list] = {}
    oc = 0
    for e in contig.locus_entries:
        if e.end > length:  # wrapped gene: adjusted [adj_start, adj_end)
            for p in range(e.start, e.end):
                locus_map.setdefault(p, []).append(e.locus_tag)
            oc = e.end - length
        else:
            for p in range(e.start, e.end):
                locus_map.setdefault(p, []).append(e.locus_tag)
                if oc <= p < overhang:
                    locus_map.setdefault(p + length, []).append(e.locus_tag)
    amb = {p % length for p, tags in locus_map.items() if len(tags) > 1}
    # the reference looks tags up at the FOLDED key (crashes if absent; we
    # tolerate absence, matching ambiguity_stats)
    tags = {t for p in amb for t in locus_map.get(p, [])}
    return len(amb), tags


def _record(n, features, seed=0):
    rng = np.random.default_rng(seed)
    rec = GenBankRecord(
        id="AMB0.1", name="AMB0", description="t", seq=random_seq(n, rng),
        topology="circular", organism="x",
    )
    rec.features.extend(features)
    return rec


WRAP = Feature(
    "gene",
    CompoundLocation([Location(1950, 2000, 1), Location(0, 60, 1)]),
    {"locus_tag": ["W"]},
)
NORM = Feature("gene", Location(20, 80, 1), {"locus_tag": ["N"]})


def test_overlapping_genes():
    feats = [
        Feature("gene", Location(100, 300, 1), {"locus_tag": ["A"]}),
        Feature("gene", Location(275, 500, -1), {"locus_tag": ["B"]}),
        Feature("gene", Location(800, 900, 1), {"locus_tag": ["C"]}),
    ]
    contig = contig_from_record(_record(3000, feats))
    genome = Genome(contigs=[contig])
    n_coords, n_tags = genome.ambiguity_stats()
    exp_coords, exp_tags = reference_ambiguity(contig)
    assert n_coords == exp_coords == 25
    assert n_tags == len(exp_tags) and exp_tags == {"A", "B"}
    # cached: second call returns the same values
    assert genome.ambiguity_stats() == (n_coords, n_tags)


def test_wrapped_then_normal_not_counted():
    # N processed AFTER the wrapped gene: overhang_continue=60 suppresses
    # its duplication below 60, so the fold-overlap is NOT counted — the
    # reference's quirk, reproduced exactly
    contig = contig_from_record(_record(2000, [WRAP, NORM], seed=1))
    genome = Genome(contigs=[contig])
    assert reference_ambiguity(contig) == (0, set())
    assert genome.ambiguity_stats() == (0, 0)


def test_normal_then_wrapped_counted():
    # N processed BEFORE the wrapped gene duplicates from position 0 and
    # collides with W's unfolded keys at 2020..2059 → 40 folded coords;
    # the folded keys 20..59 hold only N, so tags = {N}
    contig = contig_from_record(_record(2000, [NORM, WRAP], seed=1))
    genome = Genome(contigs=[contig])
    exp_coords, exp_tags = reference_ambiguity(contig)
    assert (exp_coords, exp_tags) == (40, {"N"})
    assert genome.ambiguity_stats() == (40, 1)


def test_unfolded_wrap_overlap_counted_either_order():
    # a gene overlapping the wrapped gene's pre-origin arm collides on
    # direct keys regardless of order
    pre = Feature("gene", Location(1940, 1960, 1), {"locus_tag": ["P"]})
    for feats in ([WRAP, pre], [pre, WRAP]):
        contig = contig_from_record(_record(2000, feats, seed=2))
        genome = Genome(contigs=[contig])
        exp = reference_ambiguity(contig)
        got = genome.ambiguity_stats()
        assert got == (exp[0], len(exp[1]))
        assert exp[0] == 10 and exp[1] == {"W", "P"}


def test_no_overlaps():
    rec = make_record(n=5000, n_genes=6, seed=3)
    genome = Genome(contigs=[contig_from_record(rec)])
    assert genome.ambiguity_stats() == (0, 0)


def test_random_agreement():
    rng = np.random.default_rng(7)
    for seed in range(4):
        n = int(rng.integers(1500, 4000))
        feats = []
        for i in range(int(rng.integers(3, 12))):
            a = int(rng.integers(0, n - 50))
            b = a + int(rng.integers(20, 300))
            feats.append(
                Feature("gene", Location(a, min(b, n), 1), {"locus_tag": [f"G{i}"]})
            )
        if seed % 2:
            arm = int(rng.integers(10, 100))
            feats.insert(
                int(rng.integers(0, len(feats))),
                Feature(
                    "gene",
                    CompoundLocation([Location(n - 80, n, 1), Location(0, arm, 1)]),
                    {"locus_tag": ["WR"]},
                ),
            )
        contig = contig_from_record(_record(n, feats, seed=seed))
        genome = Genome(contigs=[contig])
        exp_coords, exp_tags = reference_ambiguity(contig)
        assert genome.ambiguity_stats() == (exp_coords, len(exp_tags)), (
            seed, exp_coords, sorted(exp_tags)
        )


def reference_upstream_ambiguity(contig) -> tuple[int, set]:
    """Dict port of create_upstream_locus_map's window keys
    (targets_in_upstream.py:47-171) + its ambiguity stat (:786-796)."""
    n = contig.length
    locus_map: dict[int, list] = {}
    for e in contig.locus_entries:
        if e.strand == 1:
            ws, we = e.start - 205, (e.start - 95 if e.end > n else e.start + 95)
        elif e.strand == -1:
            ws, we = e.end + 95, e.end + 205
        else:
            continue
        for p in range(ws, we):
            locus_map.setdefault(p, []).append(e.locus_tag)
    folded = {p % n for p, v in locus_map.items() if len(v) > 1}
    tags = {t for f in folded for t in locus_map.get(f, [])}
    return len(folded), tags


def test_upstream_ambiguity_differs_from_body():
    """Two +strand genes whose promoter windows overlap but whose bodies
    do not: the upstream tool reports nonzero ambiguity where the body
    map reports zero (targets_in_upstream.py:786-807; r5 review — the
    stats previously always used the gene-body map)."""
    a = Feature("gene", Location(500, 560, 1), {"locus_tag": ["A"]})
    b = Feature("gene", Location(650, 710, 1), {"locus_tag": ["B"]})
    # windows: A [295, 595), B [445, 745) → overlap [445, 595), 150 wide
    rec = GenBankRecord(id="U1", name="U1", seq=random_seq(2000, np.random.default_rng(5)),
                        topology="circular")
    rec.features = [a, b]
    genome = Genome(contigs=[contig_from_record(rec)])
    assert genome.ambiguity_stats("body") == (0, 0)
    exp_coords, exp_tags = reference_upstream_ambiguity(genome.contigs[0])
    assert exp_coords == 150 and exp_tags == {"A", "B"}
    assert genome.ambiguity_stats("upstream") == (150, 2)


def test_upstream_ambiguity_random_agreement():
    for seed in range(4):
        rng = np.random.default_rng(400 + seed)
        n = int(rng.integers(1500, 4000))
        rec = GenBankRecord(id=f"U{seed}", name="U", seq=random_seq(n, rng),
                            topology="circular" if seed % 2 else "linear")
        feats = []
        for i in range(int(rng.integers(3, 9))):
            s = int(rng.integers(0, n - 100))
            e = s + int(rng.integers(40, 300))
            feats.append(Feature("gene", Location(s, min(e, n), 1 if rng.integers(0, 2) else -1),
                                 {"locus_tag": [f"G{i}"]}))
        rec.features = feats
        genome = Genome(contigs=[contig_from_record(rec)])
        exp_coords, exp_tags = reference_upstream_ambiguity(genome.contigs[0])
        got = genome.ambiguity_stats("upstream")
        assert got == (exp_coords, len(exp_tags)), (seed, got, exp_coords, exp_tags)
