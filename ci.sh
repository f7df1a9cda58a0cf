#!/bin/bash
# Test tiers (VERDICT r1 item 7):
#   smoke — <60 s representative gate, run on every change
#   quick — everything not marked slow (~5 min on a 2-CPU box), per PR
#   full  — the whole suite incl. oracle-heavy golden tests (~20 min), nightly
# Tests force CPU + 8 virtual devices + x64 via tests/conftest.py.
set -e
cd "$(dirname "$0")"
tier="${1:-smoke}"
case "$tier" in
  smoke) exec python -m pytest tests -q -m "smoke and not slow" ;;
  quick) exec python -m pytest tests -q -m "not slow" ;;
  full)  exec python -m pytest tests -q ;;
  bench) exec python tools/check_bench.py ;;  # real-TPU regression gate vs BENCH_CONTRACT.json
  *) echo "usage: ci.sh [smoke|quick|full|bench]" >&2; exit 2 ;;
esac
