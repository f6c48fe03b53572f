# Build/test entry points (analog of the reference's Makefiles,
# /root/reference/Makefile:1-8).

.PHONY: all native test test-all test-tpu bench clean

all: native

native: libfm_tpu/native/_fastio.so

libfm_tpu/native/_fastio.so: native/fastio.cpp
	g++ -O3 -shared -fPIC -std=c++17 -o $@ $<

# fast default (<5 min): slow-marked tests (long chains, golden runs vs
# the reference binary, multihost subprocesses) are deselected
test: native
	python -m pytest tests/ -q

# the full correctness suite (~20 min)
test-all: native
	python -m pytest tests/ -q --slow

# smoke checks that must run on the REAL device (tests/ forces a
# simulated CPU mesh): golden MCMC quality, sampler f32 tails, the mesh
# path, and the BS bf16-divergence regression (BENCHNOTES round 3)
test-tpu: native
	python -m pytest tests_tpu/ -q

bench: native
	python bench.py

clean:
	rm -f libfm_tpu/native/_fastio.so
	find . -name __pycache__ -type d -exec rm -rf {} +
