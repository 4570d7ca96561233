#!/bin/bash
# One-window TPU measurement sweep for the round-3b layout experiments.
# Run when the axon tunnel is reachable; each step is independently
# timeout-bounded so a flaky tunnel can't wedge the sweep.
set -x
cd /root/repo
timeout 1200 python scripts_dev/micro_sparse_presorted.py
timeout 1200 python scripts_dev/micro_rescore_sorted.py
timeout 1200 python scripts_dev/micro_q8_exact_pool.py
timeout 3000 python scripts_dev/bench_ensemble_presorted.py
