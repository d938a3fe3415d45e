"""One-off: freeze oracle-generated v=1..3 match tables for the CN-32
library against the bundled SnapGene contigs (NGNC), as committed goldens
(BASELINE.md plan; VERDICT r1 item 5).

Subset selection keeps the in-suite reproduction fast: every spacer with
>=1 plasmid hit at v<=3, plus the first 50 non-targeting spacers (sorted)
to exercise the unmapped path. The subset list is itself committed.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import os
import time

import numpy as np
import pandas as pd

from barcoder_tpu.core.genome import Genome
from barcoder_tpu.ops.oracle import oracle_scan
from barcoder_tpu.pipeline.targets import run_targets
from barcoder_tpu.seqio.library import BarcodeLibrary

GOLD = "/root/reference/Example_Libraries/CN-32-zmo.tsv"
OUT = "/root/repo/tests/goldens"
os.makedirs(OUT, exist_ok=True)

gold = pd.read_csv(GOLD, sep="\t")
all_spacers = sorted(set(gold.spacer))
print(f"{len(all_spacers)} unique spacers")
genome = Genome.from_snapgene("/root/reference/GCA_003054575.1")

# pass 1: which spacers hit any plasmid at v<=3?
t0 = time.time()
hitters: set[str] = set()
arr = np.array(all_spacers)
for c in genome.contigs:
    h = oracle_scan(list(arr), c, 3, "NGNC", "downstream")
    hitters.update(arr[np.unique(h.spacer_idx)])
    print(f"{c.id}: cumulative hitters {len(hitters)} ({time.time()-t0:.0f}s)")

non_targeting = [s for s in all_spacers if s not in hitters][:50]
subset = sorted(hitters) + non_targeting
with open(f"{OUT}/cn32_subset_spacers.txt", "w") as f:
    f.write("\n".join(subset) + "\n")
print(f"subset: {len(subset)} spacers ({len(hitters)} hitters + {len(non_targeting)} non-targeting)")

lib = BarcodeLibrary.from_list(subset)
for v in (1, 2, 3):
    t0 = time.time()
    res = run_targets(lib, genome, "NGNC", v, backend="oracle")
    tsv = res.table.to_csv(sep="\t", index=False)
    with open(f"{OUT}/cn32_zmo_ngnc_v{v}.tsv", "w") as f:
        f.write(tsv)
    print(f"v={v}: {len(res.table)} rows in {time.time()-t0:.0f}s")
