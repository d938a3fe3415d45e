"""One-off: enumerate the exact per-site annotation diffs between
CN-32-zmo.tsv (golden) and our run_targets output on the bundled SnapGene
contigs, so tests/test_golden_parity.py can pin the allowlist explicitly."""

import jax

jax.config.update("jax_platforms", "cpu")

import pandas as pd

from barcoder_tpu.core.genome import Genome
from barcoder_tpu.pipeline.targets import run_targets
from barcoder_tpu.seqio.library import BarcodeLibrary

GOLD = "/root/reference/Example_Libraries/CN-32-zmo.tsv"
gold = pd.read_csv(GOLD, sep="\t")
plasmids = ["CP023716.1", "CP023717.1", "CP023718.1", "CP023719.1"]
g = gold[gold.chr.isin(plasmids)].copy()
g["chr"] = g["chr"].str.replace(r"\.1$", "", regex=True)

genome = Genome.from_snapgene("/root/reference/GCA_003054575.1")
lib = BarcodeLibrary.from_list(sorted(set(g.spacer)))
res = run_targets(lib, genome, "NGNC", 0, backend="jax")
ours = res.table[res.table.chr.notna()].dropna(subset=["tar_start"]).astype(
    {"tar_start": int, "tar_end": int}
)


def ann_sets(df):
    out = {}
    for _, r in df.iterrows():
        k = (r.spacer, r.chr, int(r.tar_start), r.sp_dir)
        out.setdefault(k, set()).add(
            (
                r.locus_tag if pd.notna(r.locus_tag) else None,
                int(r.offset) if pd.notna(r.offset) else None,
                int(r.overlap) if pd.notna(r.overlap) else None,
                r.tar_dir if pd.notna(r.tar_dir) else None,
            )
        )
    return out


ga = ann_sets(g)
oa = ann_sets(ours)
common = set(ga) & set(oa)
print(f"golden sites: {len(ga)}, ours: {len(oa)}, common: {len(common)}")
print(f"golden-only: {len(set(ga) - set(oa))}, ours-only extra: {len(set(oa) - set(ga))}")
diffs = sorted(k for k in common if ga[k] != oa[k])
print(f"diff sites: {len(diffs)}")
for k in diffs:
    print(k)
    print("  golden:", sorted(ga[k], key=repr))
    print("  ours:  ", sorted(oa[k], key=repr))
