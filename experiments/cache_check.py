"""Persistent-compile-cache verification on the live chip (VERDICT r2 item 2).

Compiles ONE small real Mosaic kernel (pallas scan on a tiny genome) with
jax's cache logging turned up, then reports: cache files on disk, the
CompileStats hit/miss counters, and any serialization warnings. Run twice
in fresh processes — the second run should show cache_hits > 0 and a much
smaller first_call_s.

Usage:  timeout 900 python experiments/cache_check.py
"""

import logging
import os
import time

import numpy as np

logging.basicConfig(level=logging.DEBUG)
for noisy in ("urllib3", "filelock", "matplotlib", "PIL"):
    logging.getLogger(noisy).setLevel(logging.WARNING)
for mod in ("jax._src.compilation_cache", "jax._src.compiler",
            "jax._src.cache_key"):
    logging.getLogger(mod).setLevel(logging.DEBUG)

from barcoder_tpu.utils.profiling import compile_stats

cs = compile_stats()

from barcoder_tpu.core.encode import decode, encode
from barcoder_tpu.core.genome import Contig
from barcoder_tpu.ops.pallas_scan import pallas_scan

import jax

print("platform:", jax.devices()[0].platform)
print("cache dir:", jax.config.jax_compilation_cache_dir)

rng = np.random.default_rng(0)
n = 1 << 20
seq = decode(rng.integers(0, 4, size=n).astype(np.int8))
contig = Contig(id="CC.1", length=n, codes=encode(seq), seq=seq,
                topology="circular")
spacers = [seq[p : p + 20] for p in range(64, 64 + 512 * 13, 13)][:512]

t0 = time.time()
hits = pallas_scan(spacers, contig, 1, pam="NGG")
print("first_call_s", round(time.time() - t0, 2), "hits", len(hits))
print("stats", cs.snapshot())

d = os.path.join(os.path.expanduser("~"), ".cache", "barcoder_tpu", "jax_cache")
files = os.listdir(d) if os.path.isdir(d) else []
print("cache files:", len(files))
for f in files[:10]:
    print("  ", f, os.path.getsize(os.path.join(d, f)))
