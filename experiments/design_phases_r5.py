"""Where does design_full's 4.2 s scan_targets phase go? (r5 profiling)"""
import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
from genomes import make_record
from barcoder_tpu.core.genome import Genome, contig_from_record
from barcoder_tpu.pipeline.design import DesignOptions, apply_design_filters, find_candidate_guides
from barcoder_tpu.pipeline.targets import run_targets
from barcoder_tpu.seqio.library import BarcodeLibrary
from barcoder_tpu.utils.profiling import Phases

rec = make_record(n=4_600_000, n_genes=4200, wrapped_gene=True, seed=5)
genome = Genome(contigs=[contig_from_record(rec)])
opts = DesignOptions(mismatches=1, omit_offtargets=True).resolve(20)
cands = find_candidate_guides(genome, 20, "NGG")
lib = BarcodeLibrary.from_unique_list(cands)
run_targets(lib, genome, "NGG", 1)  # warm
for rep in range(3):
    ph = Phases()
    t0 = time.time()
    tr = run_targets(lib, genome, "NGG", 1, phases=ph)
    total = time.time() - t0
    print(f"rep{rep}: total {total:.2f}s  phases: "
          + " ".join(f"{k}={v:.2f}" for k, v in sorted(ph.timings.items())),
          flush=True)
t0 = time.time(); apply_design_filters(tr.table, 20, opts); print(f"filters {time.time()-t0:.2f}s", flush=True)
