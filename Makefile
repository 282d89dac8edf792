# Developer targets mirroring the reference's Justfile (fmt/clippy/tests).
# CPU_ENV forces the CPU backend with a virtual 8-device mesh (the sharded
# code paths run in CI exactly like this).
CPU_ENV = PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
	XLA_FLAGS=--xla_force_host_platform_device_count=8

.PHONY: install lint test test-fast bench native

install:
	pip install -e .[dev]

lint:
	python tools/lint.py

test-fast:
	$(CPU_ENV) python -m pytest tests/ -m "not slow" -q -n auto

test:
	$(CPU_ENV) python -m pytest tests/ -q -n auto

bench:
	python bench.py

native:
	$(MAKE) -C native
