#!/bin/sh
# Full local gate: tests → oracle contract (sf0.01 AND sf0.1, logged) →
# quick bench (no scaling probe). The committed CONTRACT_LOG_sf*.json
# files adjudicate the FULL registered query surface, independent of
# whichever subset the external driver snapshots.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -x -q
python tools/check_contract.py --json CONTRACT_LOG_sf0.01.json /root/testdata/sf0.01
python tools/check_contract.py --json CONTRACT_LOG_sf0.1.json /root/testdata/sf0.1
SPARK_GRAFT_BENCH_SCALING=0 python bench.py
