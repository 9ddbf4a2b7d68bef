# Mirrors the reference CLIP_benchmark Makefile targets (install/test/lint)
# plus the framework's bench/dryrun entries.

.PHONY: install test test-fast bench dryrun lint

install:
	pip install -e .

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q --ignore=tests/test_train_smoke.py \
	    --ignore=tests/test_distill_resume.py

bench:
	python bench.py

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	    python __graft_entry__.py 8

lint:
	python -m compileall -q iterated_learning_for_vlm_tpu tests scripts bench.py __graft_entry__.py
