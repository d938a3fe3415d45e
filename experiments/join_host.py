"""Host numpy seed-join cost model at E.coli design scale."""
import time
import numpy as np

N = 4_600_000
S = 1_147_256  # 573k x 2 strands
rng = np.random.default_rng(0)
scan = rng.integers(0, 4, N + 64).astype(np.int8)
qcodes = rng.integers(0, 4, (S, 20)).astype(np.int8)

t0 = time.time()
# site half-keys via sliding windows (20-bit)
w = np.lib.stride_tricks.sliding_window_view(scan, 10)[:N]
weights = (4 ** np.arange(10)).astype(np.int64)
keys = w @ weights  # (N,) int64
print(f"site keys: {time.time()-t0:.2f}s")

t0 = time.time()
order = np.argsort(keys, kind="stable")
ks = keys[order]
print(f"sort 4.6M: {time.time()-t0:.2f}s")

t0 = time.time()
qk = qcodes[:, :10].astype(np.int64) @ weights
lo = np.searchsorted(ks, qk)
hi = np.searchsorted(ks, qk + 1)
print(f"spacer keys + searchsorted x2: {time.time()-t0:.2f}s")

t0 = time.time()
cnt = hi - lo
total = int(cnt.sum())
sp_pair = np.repeat(np.arange(S, dtype=np.int32), cnt)
offs = np.concatenate([[0], np.cumsum(cnt)[:-1]])
t = np.arange(total, dtype=np.int64) - np.repeat(offs, cnt)
site_sorted = np.repeat(lo, cnt) + t
p_pair = order[site_sorted].astype(np.int64)
print(f"expand to {total} pairs: {time.time()-t0:.2f}s")

t0 = time.time()
win = np.lib.stride_tricks.sliding_window_view(scan, 20)[:N]
gw = win[p_pair]          # (total, 20) gather
mm = (gw != qcodes[sp_pair]).sum(axis=1)
hits = mm <= 1
print(f"verify: {time.time()-t0:.2f}s, hits={int(hits.sum())}")
