# Build targets for tpu_llm's native host layer.
# The reference builds with gfortran -O3 -march=native (Makefile:7-15);
# the equivalent here is the C++ host library (repacking, f16, BPE).

CXX ?= g++
CXXFLAGS ?= -O3 -march=native -std=c++17 -fPIC -Wall

native: native/libtpu_llm_native.so

native/libtpu_llm_native.so: native/src/tpu_llm_native.cpp
	$(CXX) $(CXXFLAGS) -shared -o $@ $<

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -f native/libtpu_llm_native.so

.PHONY: native test bench clean
