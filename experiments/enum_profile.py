import time
import numpy as np
from numpy.lib.stride_tricks import sliding_window_view
from barcoder_tpu.core.encode import decode, encode
from barcoder_tpu.core.genome import Contig, Genome
from barcoder_tpu.ops.prep import build_scan_array, site_masks
from barcoder_tpu.pipeline.design import _pack_windows, find_candidate_guides

n = 4_600_000
rng = np.random.default_rng(0)
seq = decode(rng.integers(0, 4, size=n).astype(np.int8))
contig = Contig(id="E.1", length=n, codes=encode(seq), seq=seq, topology="circular")
L = 20

t = {}
t0 = time.time(); scan = build_scan_array(contig, L); t["build_scan"] = time.time()-t0
t0 = time.time(); windows = sliding_window_view(scan, L)[:n]; mf, mr = site_masks(contig, L, "NGG", "downstream"); t["site_masks"] = time.time()-t0
t0 = time.time()
pos_f = np.nonzero(mf[:n])[0]; sel_f = windows[pos_f]
pos_r = np.nonzero(mr[:n])[0]; sel_r = windows[pos_r]
t["window_gather"] = time.time()-t0
t0 = time.time()
sel_rc = np.where(sel_r[:, ::-1] < 4, 3 - sel_r[:, ::-1], sel_r[:, ::-1])
t["revcomp"] = time.time()-t0
t0 = time.time()
kf, vf = _pack_windows(sel_f); kr, vr = _pack_windows(sel_rc)
t["pack"] = time.time()-t0
t0 = time.time()
keys = np.concatenate([kf[vf], kr[vr]]); ords = np.concatenate([pos_f[vf], n + pos_r[vr]])
order = np.lexsort((ords, keys))
t["lexsort"] = time.time()-t0
t0 = time.time()
ks = keys[order]
first = np.ones(len(ks), bool); first[1:] = ks[1:] != ks[:-1]
uk = ks[first][np.argsort(ords[order][first], kind="stable")]
shifts = (2*np.arange(L, dtype=np.uint64))[None,:]
codes_mat = ((uk[:,None] >> shifts) & np.uint64(3)).astype(np.int8)
t["dedup+decode"] = time.time()-t0
from barcoder_tpu.core.encode import DECODE_ASCII
t0 = time.time()
ascii_mat = DECODE_ASCII[np.clip(codes_mat,0,4)]
flat = np.ascontiguousarray(ascii_mat).view(f"S{L}").ravel()
out = [b.decode("ascii") for b in flat]
t["stringify"] = time.time()-t0
print({k: round(v,2) for k,v in t.items()}, "n_cands:", len(out))
t0 = time.time(); c2 = find_candidate_guides(Genome(contigs=[contig]), 20, "NGG"); print(f"full fn: {time.time()-t0:.2f}s")
# and the downstream re-encode cost:
from barcoder_tpu.ops.prep import spacer_matrix
t0 = time.time(); q = spacer_matrix(c2); print(f"spacer_matrix re-encode: {time.time()-t0:.2f}s")
