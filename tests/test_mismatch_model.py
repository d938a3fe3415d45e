"""Mismatch-efficacy model tests against the bundled reference weights
(/root/reference/mismatch_parameters.csv is data, not code)."""

import io

import numpy as np
import pytest

from barcoder_tpu.model.mismatch import (
    MismatchParams,
    all_single_variant_scores,
    apply_variant,
    calculate_y_pred,
    change_description,
    generate_mismatches,
)

PARAMS_CSV = "/root/reference/mismatch_parameters.csv"


@pytest.fixture(scope="module")
def params():
    return MismatchParams.from_csv(PARAMS_CSV)


class TestModel:
    def test_params_loaded(self, params):
        assert params.intercept == pytest.approx(-0.061524905)
        assert params.position_weights[0] == pytest.approx(0.770420411)
        assert params.position_weights[19] == 0.0
        assert params.gc_weight == pytest.approx(0.729597133)
        # TG substitution pinned to 0 in the published weights
        assert params.sub_weights["ACGT".index("T"), "ACGT".index("G")] == 0.0

    def test_y_pred_single_mismatch(self, params):
        original = "ACGTACGTACGTACGTACGT"
        variant = "CCGTACGTACGTACGTACGT"  # A->C at pos 0
        expected = (
            params.intercept
            + params.position_weights[0]
            + params.raw["AC"]
            + params.gc_weight * 0.5
        )
        assert calculate_y_pred(original, variant, params) == pytest.approx(expected)

    def test_y_pred_identical_is_none(self, params):
        assert calculate_y_pred("ACGT" * 5, "ACGT" * 5, params) is None

    def test_y_pred_length_mismatch_none(self, params):
        assert calculate_y_pred("ACGTA", "ACGT", params) is None

    def test_y_pred_double_mismatch_additive(self, params):
        original = "ACGTACGTACGTACGTACGT"
        variant = "CCGTACGTACGTACGTACGA"  # pos 0 A->C, pos 19 T->A
        expected = (
            params.intercept
            + params.position_weights[0]
            + params.raw["AC"]
            + params.position_weights[19]
            + params.raw["TA"]
            + params.gc_weight * 0.5
        )
        assert calculate_y_pred(original, variant, params) == pytest.approx(expected)

    def test_vectorized_matches_scalar(self, params):
        rng = np.random.default_rng(0)
        spacer = "".join(rng.choice(list("ACGT"), 20))
        variants, scores = all_single_variant_scores(spacer, params)
        assert len(variants) == 60
        for v, s in zip(variants, scores):
            assert s == pytest.approx(
                calculate_y_pred(spacer, apply_variant(spacer, v), params)
            )

    def test_generate_no_reuse_and_grid(self, params):
        spacer = "ACGTACGTACGTACGTACGT"
        chosen = generate_mismatches(spacer, 0.0, 1.0, 0.1, params)
        assert len(chosen) == 11  # arange(0, 1.1, .1)
        picked = [v for v, _ in chosen]
        assert len(set(picked)) == len(picked)  # greedy, no reuse

    def test_change_description(self):
        assert change_description("ACGT", (1, "T")) == "C2T"


class TestCli:
    def test_mismatches_mode(self, tmp_path, capsys):
        import sys

        from barcoder_tpu.cli.mismatch import main

        spacers = tmp_path / "spacers.tsv"
        spacers.write_text("target\nACGTACGTACGTACGTACGT\n")
        rc = main(
            [
                "mismatches",
                "--spacers_file",
                str(spacers),
                "--parameters_file",
                PARAMS_CSV,
                "--min",
                "0",
                "--max",
                "0.5",
                "--step",
                "0.25",
            ]
        )
        assert rc == 0
        out = capsys.readouterr().out
        lines = out.strip().splitlines()
        assert lines[0].split("\t") == ["original", "variant", "change_description", "y_pred"]
        assert len(lines) == 4  # header + 3 grid points

    def test_recalculate_mode(self, tmp_path, capsys):
        from barcoder_tpu.cli.mismatch import main

        tsv = tmp_path / "mm.tsv"
        tsv.write_text(
            "target\tspacer\nACGTACGTACGTACGTACGT\tCCGTACGTACGTACGTACGT\n"
        )
        rc = main(
            ["recalculate", "--existing_mismatches", str(tsv), "--parameters_file", PARAMS_CSV]
        )
        assert rc == 0
        out = capsys.readouterr().out
        assert "y_pred" in out.splitlines()[0]
        val = float(out.splitlines()[1].split("\t")[-1])
        assert 0 < val < 2
