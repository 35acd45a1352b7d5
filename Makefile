.PHONY: test bench native clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	g++ -O2 -shared -fPIC -o cvsim_tpu/native/libhostio.so cvsim_tpu/native/hostio.cpp
	g++ -O2 -o .bench_scalar_baseline cvsim_tpu/native/scalar_baseline.cpp

clean:
	rm -rf .jax_cache .bench_scalar_baseline cvsim_tpu/native/libhostio.so \
	    $(shell find . -name __pycache__ -type d)
