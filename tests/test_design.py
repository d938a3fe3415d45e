"""Design workload tests: candidate enumeration vs a regex oracle, and the
filter cascade on synthetic genomes."""

import re

import numpy as np
import pytest

from barcoder_tpu.core.encode import revcomp
from barcoder_tpu.pipeline.design import (
    DesignOptions,
    apply_design_filters,
    find_candidate_guides,
    is_dna,
    run_design,
)

from .genomes import genome_from_records, make_record


def regex_candidates(seq, circular, L, pam):
    """Oracle mirroring design_guides.py:22-49 (downstream PAM) with the
    minimal exact halo instead of the 100 kb overhang."""
    out = set()
    pam_regex = re.compile(pam.replace("N", "[ATGC]"))
    topo = seq + seq[: L + len(pam) - 1] if circular else seq
    for s in (topo, revcomp(topo)):
        for i in range(len(s) - L - len(pam) + 1):
            if pam_regex.match(s[i + L : i + L + len(pam)]):
                spacer = s[i : i + L]
                if is_dna(spacer):
                    out.add(spacer)
    return out


class TestEnumeration:
    @pytest.mark.parametrize("topology", ["circular", "linear"])
    def test_matches_regex_oracle(self, topology):
        rec = make_record(n=3000, topology=topology, seed=21)
        genome = genome_from_records([rec])
        got = set(find_candidate_guides(genome, 20, "NGG"))
        want = regex_candidates(rec.seq, topology == "circular", 20, "NGG")
        assert got == want
        assert len(got) > 100

    def test_n_excluded(self):
        rec = make_record(n=1000, seed=22)
        rec.seq = rec.seq[:100] + "N" + rec.seq[101:]
        genome = genome_from_records([rec])
        got = find_candidate_guides(genome, 20, "NGG")
        assert all("N" not in g for g in got)

    @pytest.mark.parametrize("L", [33, 40, 70])
    def test_long_barcodes_match_regex_oracle(self, L):
        # L > 32 overflows a single uint64 dedup key; 40-mers differing
        # only past position 31 must stay distinct, and emitted sequences
        # must be the true windows (the old key-decode zeroed the tail)
        rec = make_record(n=2500, topology="circular", seed=29)
        genome = genome_from_records([rec])
        got = find_candidate_guides(genome, L, "NGG")
        want = regex_candidates(rec.seq, True, L, "NGG")
        assert set(got) == want
        assert len(got) == len(set(got))
        assert len(got) > 20

    def test_tail_differing_long_pair_kept(self):
        # two planted 40-mers identical in their first 32 bases
        rec = make_record(n=1200, topology="linear", seed=30)
        head = "ACGT" * 8  # 32 bases
        g1, g2 = head + "AAAATTTT", head + "CCCCGGGG"
        s = list(rec.seq)
        for pos, g in ((100, g1), (400, g2)):
            for i, ch in enumerate(g + "TGG"):
                s[pos + i] = ch
        rec.seq = "".join(s)
        genome = genome_from_records([rec])
        got = set(find_candidate_guides(genome, 40, "NGG"))
        assert g1 in got and g2 in got

    def test_upstream_pam(self):
        rec = make_record(n=2000, seed=23)
        genome = genome_from_records([rec])
        got = set(find_candidate_guides(genome, 20, "TTTN", pam_direction="upstream"))
        # oracle: upstream on forward strand
        found_any = False
        for i in range(4, len(rec.seq) - 20):
            if re.match("TTT[ATGC]", rec.seq[i - 4 : i]):
                assert rec.seq[i : i + 20] in got or "N" in rec.seq[i : i + 20]
                found_any = True
        assert found_any


class TestFullOverlapWithNonTargeting:
    def test_na_overlap_rows_do_not_crash(self):
        # full_overlap + keep_top + tiling on a table that still carries
        # non-targeting rows (NA overlap/offset/locus_tag): the nullable
        # boolean masks used to raise "boolean value of NA is ambiguous";
        # the reference's numpy NaN comparisons read as False
        import pandas as pd

        rows = []
        for i in range(30):
            rows.append(dict(
                spacer=f"ACGT{i:016d}"[:20], locus_tag="TST_0001",
                gene="g", chr="C0", pam="AGG", mismatches=0,
                target="A" * 20, tar_start=100 + i, tar_end=120 + i,
                offset=i, overlap=20 if i % 2 else 15,
                sp_dir="F", tar_dir="F", note="1 site, 1 gene",
            ))
        rows.append(dict(
            spacer="T" * 20, locus_tag=None, gene=None, chr=None, pam=None,
            mismatches=0, target=None, tar_start=None, tar_end=None,
            offset=None, overlap=None, sp_dir=None, tar_dir=None,
            note="non-targeting",
        ))
        df = pd.DataFrame(rows).convert_dtypes(dtype_backend="pyarrow")
        opts = DesignOptions(
            mismatches=0, omit_offtargets=False, omit_intergenic=False,
            full_overlap=True, keep_top=3, tile_size=5,
        ).resolve(20)
        out = apply_design_filters(df, 20, opts)
        assert len(out) > 0
        assert (out["overlap"] == 20).all()  # partial-overlap guides gone
        assert "T" * 20 not in set(out["spacer"])

    def test_noteless_frame_raises_clear_error(self):
        # a targets frame without `note` used to hit a NameError deep in
        # note_field; the note-dependent filters must fail loudly instead
        import pandas as pd

        df = pd.DataFrame([dict(
            spacer="A" * 20, locus_tag="TST_0001", gene="g", chr="C0",
            pam="AGG", mismatches=0, target="A" * 20, tar_start=100,
            tar_end=120, offset=0, overlap=20, sp_dir="F", tar_dir="F",
        )])
        for kw in ("omit_offtargets", "omit_ambiguous"):
            opts = DesignOptions(
                mismatches=0, omit_intergenic=False, keep_top=0, **{kw: True}
            )
            with pytest.raises(ValueError, match="note"):
                apply_design_filters(df.copy(), 20, opts)
        opts = DesignOptions(mismatches=0, omit_intergenic=True, keep_top=0)
        with pytest.raises(ValueError, match="note"):
            apply_design_filters(df.copy(), 20, opts)
        # without note-dependent filters the frame passes through fine
        opts = DesignOptions(mismatches=0, omit_intergenic=False, keep_top=0)
        out = apply_design_filters(df.copy(), 20, opts)
        assert len(out) == 1


class TestDesignEndToEnd:
    @pytest.fixture(scope="class")
    def design_result(self):
        rec = make_record(n=8000, topology="circular", seed=24, n_genes=6)
        genome = genome_from_records([rec])
        opts = DesignOptions(mismatches=1, omit_offtargets=True, keep_top=3)
        final, tr, candidates = run_design(genome, "NGG", 20, opts)
        return rec, final, tr, candidates

    def test_pipeline_produces_guides(self, design_result):
        rec, final, tr, candidates = design_result
        assert len(candidates) > 200
        assert len(final) > 0
        # all retained rows are perfect, oriented, unique-site, genic
        assert (final["mismatches"] == 0).all() if "mismatches" in final.columns else True
        assert (final["sp_dir"] == final["tar_dir"]).all()
        assert final["note"].str.startswith("1 site").all()
        assert (~final["note"].str.contains("intergenic")).all()

    def test_keep_top(self, design_result):
        rec, final, tr, candidates = design_result
        per_gene = final.groupby("locus_tag")["spacer"].nunique()
        assert (per_gene <= 3).all()

    def test_guides_hit_their_site(self, design_result):
        rec, final, tr, candidates = design_result
        # non-wrapping rows only (wrapping rows have negative tar_start)
        plain = final[(final.tar_start >= 0) & (final.tar_end > final.tar_start)]
        assert len(plain) > 0
        for _, row in plain.head(10).iterrows():
            window = rec.seq[int(row.tar_start) : int(row.tar_end)]
            if row.sp_dir == "R":
                window = revcomp(window)
            assert window == row.spacer

    @pytest.mark.slow
    def test_sharded_backend_matches_jax(self):
        """The full design cascade through the 8-fake-device sharded engine
        produces a byte-identical final TSV to the XLA backend — the
        integration pin for `design --backend sharded` (VERDICT r3 item 4;
        reference stage being replaced: design_guides.py:90-104)."""
        rec = make_record(n=8000, topology="circular", seed=24, n_genes=6)
        genome = genome_from_records([rec])
        opts = DesignOptions(mismatches=1, omit_offtargets=True, keep_top=3)
        a, _, _ = run_design(genome, "NGG", 20, opts, backend="jax")
        b, _, _ = run_design(genome, "NGG", 20, opts, backend="sharded")
        assert a.to_csv(sep="\t", index=False) == b.to_csv(sep="\t", index=False)

    def test_tiling_spacing(self):
        rec = make_record(n=6000, topology="circular", seed=25, n_genes=3)
        genome = genome_from_records([rec])
        opts = DesignOptions(mismatches=0, omit_offtargets=True, keep_top=0, tile_size=50)
        final, tr, _ = run_design(genome, "NGG", 20, opts)
        if len(final):
            for _, group in final.groupby("locus_tag"):
                offs = sorted(group["offset"].unique())
                assert all(b - a >= 50 for a, b in zip(offs, offs[1:]))


class TestNaNOffsetGroups:
    """Unstranded features (targets.py:231-232) produce rows with a
    locus_tag but a NaN offset; the filter cascade must neither crash nor
    keep them where the reference's nsmallest would drop them (r5
    review)."""

    def _frame(self):
        import pandas as pd

        rows = []
        # normal gene: 4 rows with real offsets
        for i in range(4):
            rows.append(dict(
                spacer=f"G{i}", target="acgt", note="1 sites, 1 genes",
                sp_dir="F", tar_dir="F", mismatches=0, locus_tag="LOK",
                offset=float(10 + 40 * i), overlap=20, chr="c1",
                tar_start=100 + i, tar_end=120 + i,
            ))
        # unstranded gene: all offsets NaN
        for i in range(3):
            rows.append(dict(
                spacer=f"N{i}", target="acgt", note="1 sites, 1 genes",
                sp_dir="F", tar_dir=None, mismatches=0, locus_tag="LNAN",
                offset=float("nan"), overlap=20, chr="c1",
                tar_start=500 + i, tar_end=520 + i,
            ))
        return pd.DataFrame(rows)

    def test_tiling_skips_all_nan_group(self):
        from barcoder_tpu.pipeline.design import DesignOptions, apply_design_filters

        opts = DesignOptions(
            orientation="both", omit_intergenic=False, keep_top=0,
            tile_size=30, mismatches=0,
        ).resolve(20)
        out = apply_design_filters(self._frame(), 20, opts)  # must not raise
        kept = set(out["spacer"])
        assert "G0" in kept  # tiling of the real group still works
        assert not any(s.startswith("N") for s in kept)

    def test_keep_top_drops_nan_offsets(self):
        from barcoder_tpu.pipeline.design import DesignOptions, apply_design_filters

        opts = DesignOptions(
            orientation="both", omit_intergenic=False, keep_top=2,
            tile_size=-1, mismatches=0,
        ).resolve(20)
        out = apply_design_filters(self._frame(), 20, opts)
        kept = set(out["spacer"])
        # nsmallest(2, 'offset') picks the 2 smallest REAL offsets per
        # gene and never a NaN row
        assert {"G0", "G1"} <= kept
        assert not any(s.startswith("N") for s in kept)


def test_design_options_resolve_is_pure():
    """resolve() returns a modified copy: mutating the caller's options
    carried tile_size/omit_offtargets into later runs (r5 review)."""
    from barcoder_tpu.pipeline.design import DesignOptions

    opts = DesignOptions(omit_ambiguous=True)
    r1 = opts.resolve(20)
    assert r1.tile_size == 20 and r1.omit_offtargets
    assert opts.tile_size is None and not opts.omit_offtargets
    opts.omit_ambiguous = False
    r2 = opts.resolve(32)
    assert r2.tile_size == 32 and not r2.omit_offtargets
