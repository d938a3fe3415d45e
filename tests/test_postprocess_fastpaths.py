"""The factorized/vectorized postprocess fast paths must equal their
row-wise reference formulations (which reproduce targets.py/design_guides
semantics) on randomized inputs."""

import numpy as np
import pandas as pd

from barcoder_tpu.pipeline.targets import (
    build_notes,
    create_note,
    filter_offtargets_by_pam,
)


def test_build_notes_equals_create_note():
    rng = np.random.default_rng(0)
    n = 4000
    note = pd.DataFrame(
        {
            "count": rng.integers(0, 3, n),
            "sites": rng.integers(0, 5, n),
            "genes": rng.integers(0, 5, n),
            "intergenic": rng.integers(0, 5, n),
        }
    )
    vec = build_notes(note)
    ref = note.apply(create_note, axis=1).to_numpy()
    assert (vec == ref).all()


def test_filter_offtargets_matches_isin_formulation():
    rng = np.random.default_rng(1)
    n = 2000
    spacers = rng.integers(0, 300, n).astype(str)
    target = np.where(rng.random(n) < 0.4, "ACGT", None)
    df = pd.DataFrame({"spacer": spacers, "target": target, "x": np.arange(n)})
    got = filter_offtargets_by_pam(df)
    targeting = df[df["target"].notna()]["spacer"].unique()
    want = df[~((df["target"].isna()) & (df["spacer"].isin(targeting)))]
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )


def test_design_note_fields_match_direct_extract():
    from barcoder_tpu.pipeline.design import DesignOptions, apply_design_filters

    rng = np.random.default_rng(2)
    n = 800
    sites = rng.integers(1, 4, n)
    genes = rng.integers(0, 3, n)
    inter = rng.integers(0, 3, n)
    notes = build_notes(pd.DataFrame({"sites": sites, "genes": genes, "intergenic": inter}))
    df = pd.DataFrame(
        {
            "spacer": [f"S{i}" for i in range(n)],
            "target": ["acgt"] * n,
            "note": notes,
            "sp_dir": "F",
            "tar_dir": rng.choice(["F", "R"], n),
            "mismatches": 0,
            "locus_tag": [f"L{i//8}" for i in range(n)],
            "offset": rng.integers(0, 500, n),
            "overlap": 20,
            "chr": "c1",
            "tar_start": rng.integers(0, 10000, n),
            "tar_end": rng.integers(0, 10000, n),
        }
    )
    opts = DesignOptions(
        orientation="both", omit_ambiguous=True, omit_intergenic=True,
        keep_top=3, tile_size=30, mismatches=0,
    ).resolve(20)
    out = apply_design_filters(df, 20, opts)
    # reference formulation of the surviving-row predicate
    s = df["note"].str.extract(r"(\d+) site", expand=False).fillna(0).astype(int)
    g = df["note"].str.extract(r"(\d+) gene", expand=False).fillna(0).astype(int)
    i = df["note"].str.extract(r"(\d+) intergenic", expand=False).fillna(0).astype(int)
    base = df[(s == 1) & (g == 1) & (i == 0) & ~df["note"].str.contains("intergenic")]
    assert set(out["spacer"]) <= set(base["spacer"])
    assert "_nc" not in out.columns
    assert len(out) > 0
