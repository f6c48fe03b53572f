# Build/test entry points (analog of the reference's Makefiles,
# /root/reference/Makefile:1-8).

.PHONY: all native test bench clean

all: native

native: libfm_tpu/native/_fastio.so

libfm_tpu/native/_fastio.so: native/fastio.cpp
	g++ -O3 -shared -fPIC -std=c++17 -o $@ $<

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

clean:
	rm -f libfm_tpu/native/_fastio.so
	find . -name __pycache__ -type d -exec rm -rf {} +
