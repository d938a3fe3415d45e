"""Upstream-promoter and insert-site variants of the targets workload
(targets_in_upstream.py and insertCharacteristics.py equivalents)."""

import numpy as np
import pytest

from barcoder_tpu.core.genome import build_upstream_entries, contig_from_record
from barcoder_tpu.pipeline.targets import run_targets
from barcoder_tpu.seqio.library import BarcodeLibrary

from .genomes import genome_from_records, make_record, plant_guide, random_seq


class TestUpstreamWindows:
    def test_window_construction_forward(self):
        rec = make_record(n=10000, seed=30, n_genes=5)
        contig = contig_from_record(rec)
        ups = build_upstream_entries(contig)
        # gene 1 (strand... make_record: even index strand +1): gene 0 at
        # [0, 1000): window = [-205, 95)
        e0 = [e for e in ups if e.locus_tag == "TST_0000"][0]
        assert (e0.join_start, e0.join_end) == (-205, 95)
        # gene 1 at [2000, 3000) strand -1: window [3000+95, 3000+205)
        e1 = [e for e in ups if e.locus_tag == "TST_0001"][0]
        assert (e1.join_start, e1.join_end) == (3095, 3205)
        # stored coords stay the gene's own
        assert (e1.start, e1.end) == (2000, 3000)

    def test_hit_in_promoter_annotated(self):
        rng = np.random.default_rng(31)
        g = random_seq(20, rng)
        rec = make_record(n=10000, seed=31, n_genes=5)
        # gene 2 at [4000, 5000) strand +1 → window [3795, 4095)
        plant_guide(rec, g, 3900, pam="TGG")
        genome = genome_from_records([rec])
        lib = BarcodeLibrary.from_list([g])
        res = run_targets(lib, genome, "NGG", 0, gene_window="upstream")
        row = res.table[res.table.tar_start == 3900].iloc[0]
        assert row.locus_tag == "TST_0002"
        assert row.offset == 3900 - 4000  # offset vs gene start, negative
        assert row.overlap == 0  # no overlap with the gene body itself

    def test_gene_body_hit_not_annotated_in_upstream_mode(self):
        rng = np.random.default_rng(32)
        g = random_seq(20, rng)
        rec = make_record(n=10000, seed=32, n_genes=5)
        # middle of gene 2 body [4000, 5000) — but also inside gene 2's own
        # +95 window? no: window is [3795, 4095); plant at 4500
        plant_guide(rec, g, 4500, pam="AGG")
        genome = genome_from_records([rec])
        lib = BarcodeLibrary.from_list([g])
        res = run_targets(lib, genome, "NGG", 0, gene_window="upstream")
        row = res.table[res.table.tar_start == 4500].iloc[0]
        assert pd_isna(row.locus_tag)

    def test_reverse_strand_promoter(self):
        rng = np.random.default_rng(33)
        g = random_seq(20, rng)
        rec = make_record(n=10000, seed=33, n_genes=5)
        # gene 1 [2000, 3000) strand -1 → window [3095, 3205)
        plant_guide(rec, g, 3150, pam="CGG")
        genome = genome_from_records([rec])
        lib = BarcodeLibrary.from_list([g])
        res = run_targets(lib, genome, "NGG", 0, gene_window="upstream")
        row = res.table[res.table.tar_start == 3150].iloc[0]
        assert row.locus_tag == "TST_0001"
        assert row.tar_dir == "R"
        assert row.offset == 3000 - 3170  # feature_end - tar_end


class TestInsertSite:
    def test_forward_insertion(self):
        rng = np.random.default_rng(34)
        g = random_seq(20, rng)
        rec = make_record(n=10000, seed=34)
        plant_guide(rec, g, 1000, pam="TGG")
        genome = genome_from_records([rec])
        lib = BarcodeLibrary.from_list([g])
        res = run_targets(lib, genome, "NGG", 0, insert_site=True)
        row = res.table[res.table.tar_start == 1000].iloc[0]
        assert row.insSite == 1020 + 49
        assert row.insDirection == "F"
        cols = list(res.table.columns)
        assert cols.index("insDirection") == cols.index("overlap") + 1
        assert cols.index("insSite") == cols.index("insDirection") + 1

    def test_reverse_insertion_mod_length(self):
        rng = np.random.default_rng(35)
        g = random_seq(20, rng)
        n = 10000
        rec = make_record(n=n, seed=35)
        plant_guide(rec, g, 10, pam="GGG", strand="R")
        genome = genome_from_records([rec])
        lib = BarcodeLibrary.from_list([g])
        res = run_targets(lib, genome, "NGG", 0, insert_site=True)
        row = res.table[res.table.tar_start == 10].iloc[0]
        assert row.insDirection == "R"
        assert row.insSite == (10 - 49) % n  # wraps: 9961

    def test_compat_columns_reference_header(self):
        """--compat-columns emits insertCharacteristics.py's exact header
        (insertCharacteristics.py:800-833): camelCase names, no sp_dir,
        insDirection/insSite between overlap and targDir, insSite kept
        out of the Int64 set."""
        rng = np.random.default_rng(36)
        g = random_seq(20, rng)
        rec = make_record(n=10000, seed=36)
        plant_guide(rec, g, 1000, pam="TGG")
        genome = genome_from_records([rec])
        lib = BarcodeLibrary.from_list([g])
        res = run_targets(lib, genome, "NGG", 0, insert_site=True,
                          compat_columns=True)
        assert list(res.table.columns) == [
            "spacer", "locus_tag", "gene", "chrom", "CRISPRtTarget",
            "targStart", "targEnd", "offset", "overlap", "insDirection",
            "insSite", "targDir", "note",
        ]
        assert str(res.table["targStart"].dtype) == "Int64"
        assert str(res.table["insSite"].dtype) != "Int64"
        base = run_targets(lib, genome, "NGG", 0, insert_site=True)
        assert (res.table["CRISPRtTarget"] == base.table["target"]).all()


def pd_isna(x):
    import pandas as pd

    return pd.isna(x)
