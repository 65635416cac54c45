# Developer entry points (reference: MirrorFusion/Makefile:73-79 runs the
# test suites; TPU-native equivalents below).

.PHONY: test test-fast bench bench-all golden lint native

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x --ignore=tests/test_cli.py

bench:
	python bench.py

bench-all:
	python benchmarks/benchmark_mirrorfusion.py

# Regenerate golden parity data from the read-only reference checkout.
golden:
	python tests/golden/generate_golden_schedulers.py
	python tests/golden/generate_golden_dataset.py
	python tests/golden/generate_golden_models.py
	python tests/golden/generate_golden_pipeline.py
	python tests/golden/generate_golden_ip.py
	python tests/golden/generate_golden_sdxl.py

lint:
	python -m compileall -q reflecting_reality_tpu

# Native sample-transform kernels (optional accelerator; the ctypes wrapper
# in reflecting_reality_tpu/data/native.py also builds this on first use).
native:
	g++ -O3 -Wall -shared -fPIC -o reflecting_reality_tpu/data/_native_transforms.so native/transforms.cpp
