# Standard entry points.  CPU targets force JAX_PLATFORMS=cpu with 8
# virtual devices (multi-chip sharding tests without a pod); TPU targets
# use whatever accelerator the environment provides.

PY := python

.PHONY: test test-tpu bench bench-suite bench-d-envelope probes \
        experiment experiment-exact pod-demo dryrun native clean

test:            ## full CPU suite (parity, kernels in interpret mode, sharding)
	$(PY) -m pytest tests/ -q

test-tpu:        ## TPU-gated tests on a real chip
	OCO_TESTS_TPU=1 $(PY) -m pytest tests/ -m requires_tpu -q

bench:           ## headline metric (one JSON line)
	$(PY) bench.py

bench-suite:     ## every compute path -> BENCH_DETAILS.jsonl
	$(PY) bench_suite.py

bench-d-envelope:## kernel-vs-scan throughput at d in {5,16,32,64,128}
	$(PY) bench_suite.py --d-envelope

probes:          ## measurement probes behind docs/BENCHMARKS.md claims
	$(PY) scripts/checkify_pricing.py
	$(PY) scripts/ssn_onchip_probe.py
	sh scripts/compile_cache_experiment.sh

experiment:      ## reference-scale pipeline (figures + results.json)
	$(PY) -m online_convex_optimization_tpu.experiments.driver \
	    --t-max 1000 --g-runs 1000 --out-dir results

experiment-exact:## exact-FTL pipeline (exact_ftl_driver.py equivalent)
	$(PY) -m online_convex_optimization_tpu.experiments.driver \
	    --exact --g-runs 200 --out-dir results

pod-demo:        ## pod-scale g sweep (1M device-generated seqs x eta grid)
	$(PY) -m online_convex_optimization_tpu.experiments.pod_demo \
	    --out results/pod_scale_demo.json

dryrun:          ## single-chip entry + multi-chip dry run
	$(PY) __graft_entry__.py

native:          ## build the C++ runtime library
	$(PY) -c "from online_convex_optimization_tpu.utils import native; native.load(); print('native OK:', native.num_threads(), 'threads')"

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; true
