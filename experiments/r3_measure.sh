#!/bin/bash
# Round-3 TPU measurement battery — SUPERSEDED by the individual drivers
# actually used (results live in BASELINE.md "round 3"):
#   experiments/cache_check.py   — persistent-cache hit/miss across processes
#   experiments/shard_gap.py     — sharded-vs-single breakdown (LAST_TIMINGS)
#   experiments/count_tpu.py     — device/sharded/vector counting engines
#   python bench.py --inner      — full driver metric battery
#   python -m barcoder_tpu.parallel.scaling 4600000 9984 --engine flagship --single-chip
#   python -m barcoder_tpu.parallel.scaling 2097152 1024 --cpu --devices 1,2,4,8
#
# Hard-won protocol (see CLAUDE.md): ONE TPU process at a time, everything
# under timeout, and the FIRST dispatched program of a process pays a
# session attach — ~20 s on a quiet chip, 4-22 MINUTES if another TPU
# process exited recently. Batch measurements into one process; leave gaps
# between processes; never kill by pattern.
