import sys, time, cProfile, pstats, io
sys.path.insert(0, "/root/repo/tests")
from genomes import make_record
from barcoder_tpu.core.genome import Genome, contig_from_record
from barcoder_tpu.pipeline.design import DesignOptions, run_design
import barcoder_tpu.pipeline.targets as T

rec = make_record(n=4_600_000, n_genes=4200, wrapped_gene=True, seed=5)
genome = Genome(contigs=[contig_from_record(rec)])
opts = DesignOptions(mismatches=1, omit_offtargets=True).resolve(20)

# capture postprocess inputs by monkeypatching
captured = {}
orig = T.postprocess
def cap(results, *a, **k):
    captured["args"] = (results.copy(), *a)
    captured["kwargs"] = dict(k)
    return orig(results, *a, **k)
T.postprocess = cap
df, tr, cands = run_design(genome, "NGG", 20, opts)
T.postprocess = orig
args = captured["args"]; kwargs = captured["kwargs"]
print("results rows:", len(args[0]))
t0 = time.time(); r = orig(args[0].copy(), *args[1:], **kwargs); print(f"postprocess: {time.time()-t0:.1f}s")
pr = cProfile.Profile(); pr.enable()
r = orig(args[0].copy(), *args[1:], **kwargs)
pr.disable()
s = io.StringIO(); pstats.Stats(pr, stream=s).sort_stats("tottime").print_stats(14)
print(s.getvalue()[:2600])
