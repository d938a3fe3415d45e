import sys, time, cProfile, pstats, io
sys.path.insert(0, "/root/repo/tests")
import numpy as np
from genomes import make_record
from barcoder_tpu.core.genome import Genome, contig_from_record
from barcoder_tpu.pipeline.design import DesignOptions, run_design

rec = make_record(n=1_000_000, n_genes=900, wrapped_gene=True, seed=5)
genome = Genome(contigs=[contig_from_record(rec)])
opts = DesignOptions(mismatches=1, omit_offtargets=True).resolve(20)
run_design(genome, "NGG", 20, DesignOptions(mismatches=1, omit_offtargets=True).resolve(20))  # warm jits
pr = cProfile.Profile()
pr.enable()
t0 = time.time()
df, tr, cands = run_design(genome, "NGG", 20, opts)
dt = time.time() - t0
pr.disable()
print(f"run_design 1Mb: {dt:.1f}s rows={len(df)}")
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(28)
print("\n".join(l for l in s.getvalue().splitlines() if "barcoder" in l or "pandas" in l.split("/")[-1][:6] or "{" in l)[:4000])
