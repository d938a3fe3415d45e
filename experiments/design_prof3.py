import sys, time, cProfile, pstats, io
sys.path.insert(0, "/root/repo/tests")
import numpy as np
from genomes import make_record
from barcoder_tpu.core.genome import Genome, contig_from_record
from barcoder_tpu.pipeline.design import DesignOptions, run_design

rec = make_record(n=1_000_000, n_genes=900, wrapped_gene=True, seed=5)
genome = Genome(contigs=[contig_from_record(rec)])
run_design(genome, "NGG", 20, DesignOptions(mismatches=1, omit_offtargets=True).resolve(20))
pr = cProfile.Profile(); pr.enable()
df, tr, cands = run_design(genome, "NGG", 20, DesignOptions(mismatches=1, omit_offtargets=True).resolve(20))
pr.disable()
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("tottime").print_stats(22)
print(s.getvalue()[:3500])
