#!/bin/sh
# Persistent-compilation-cache experiment (VERDICT round-3 task 3).
# Three fresh processes: cold populate, warm reuse, no-cache control.
# Results land in BENCH_DETAILS.jsonl (compile_cache_* metrics) and are
# interpreted in docs/BENCHMARKS.md.
set -e
cd "$(dirname "$0")/.."
CACHE=$(mktemp -d /tmp/oco_jax_cache.XXXXXX)
echo "cache dir: $CACHE"
python scripts/compile_cache_probe.py --label cold --cache-dir "$CACHE"
echo "--- cache contents after cold run:"; ls -la "$CACHE" || true
python scripts/compile_cache_probe.py --label warm --cache-dir "$CACHE"
python scripts/compile_cache_probe.py --label control
