#!/usr/bin/env bash
# Launch training (parity surface with the reference's richsem_dist.sh:
# `bash scripts/train.sh -c configs/richsem/richsem_4scale_lvis.py
#  --output_dir out/ [--options k=v ...]`).
# Single process per host; GSPMD shards over all local TPU devices.
# Multi-host: set COORDINATOR_ADDRESS and run one copy per host.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m richsem_tpu.train.main "$@"
