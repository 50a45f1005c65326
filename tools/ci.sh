#!/bin/sh
# Full local gate: tests → oracle contract → quick bench (no scaling probe).
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -x -q
python tools/check_contract.py
SPARK_GRAFT_BENCH_SCALING=0 python bench.py
