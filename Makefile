# falcon_tpu build/test entry points.
#
# `make test` runs the suite on a virtual 8-device CPU mesh (the TPU's axon
# sitecustomize force-registers the real chip unless PALLAS_AXON_POOL_IPS
# is cleared BEFORE the interpreter starts, hence the env here).

TEST_ENV = PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
	XLA_FLAGS=--xla_force_host_platform_device_count=8

test:
	$(TEST_ENV) python -m pytest tests/ -x -q

test-fast:
	$(TEST_ENV) python -m pytest tests/ -x -q -m "not slow"

bench:
	python bench.py

native:
	g++ -O2 -std=c++17 -shared -fPIC falcon_tpu/native/falcon_native.cpp \
		-o /tmp/ftpu_native/libfalcon_native.so

.PHONY: test test-fast bench native
