PY ?= python

# Tests must run on the virtual 8-device CPU mesh; the env vars must be set
# before the interpreter starts (a site hook may initialize jax at startup).
TEST_ENV = PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8"

.PHONY: test test-smoke test-fast bench

test:
	$(TEST_ENV) $(PY) -m pytest tests/ -q

# <5-min signal covering every subsystem shallowly (tests/conftest.py
# curates the tier; everything still runs under `make test`)
test-smoke:
	$(TEST_ENV) $(PY) -m pytest tests/ -q -m smoke

test-fast:
	$(TEST_ENV) $(PY) -m pytest tests/ -q --ignore=tests/test_e2e.py \
		--ignore=tests/test_torch_parity.py --ignore=tests/test_fused_denoiser.py

bench:
	$(PY) bench.py
