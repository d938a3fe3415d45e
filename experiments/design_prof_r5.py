import sys, cProfile, pstats, io
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
from genomes import make_record
from barcoder_tpu.core.genome import Genome, contig_from_record
from barcoder_tpu.pipeline.design import find_candidate_guides
from barcoder_tpu.pipeline.targets import run_targets
from barcoder_tpu.seqio.library import BarcodeLibrary

rec = make_record(n=4_600_000, n_genes=4200, wrapped_gene=True, seed=5)
genome = Genome(contigs=[contig_from_record(rec)])
cands = find_candidate_guides(genome, 20, "NGG")
lib = BarcodeLibrary.from_unique_list(cands)
run_targets(lib, genome, "NGG", 1)  # warm
pr = cProfile.Profile()
pr.enable()
tr = run_targets(lib, genome, "NGG", 1)
pr.disable()
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(35)
print(s.getvalue()[:5500], flush=True)
