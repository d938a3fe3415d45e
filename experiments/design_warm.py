import sys, time
sys.path.insert(0, "/root/repo/tests")
from genomes import make_record
from barcoder_tpu.core.genome import Genome, contig_from_record
from barcoder_tpu.pipeline.design import DesignOptions, run_design

rec = make_record(n=4_600_000, n_genes=4200, wrapped_gene=True, seed=5)
genome = Genome(contigs=[contig_from_record(rec)])
opts = DesignOptions(mismatches=1, omit_offtargets=True).resolve(20)
df, tr, cands = run_design(genome, "NGG", 20, opts)  # warm
for _ in range(2):
    t0 = time.time()
    df, tr, cands = run_design(genome, "NGG", 20, opts)
    print(f"run_design E.coli warm: {time.time()-t0:.1f}s rows={len(df)}")
