CXX ?= g++
CXXFLAGS ?= -O3 -std=c++17 -fPIC -pthread -Wall

native: quantized_training_tpu/data/libtokenloader.so

quantized_training_tpu/data/libtokenloader.so: cpp/tokenloader.cpp
	$(CXX) $(CXXFLAGS) -shared $< -o $@

test:
	python -m pytest tests/ -q

clean:
	rm -f quantized_training_tpu/data/libtokenloader.so

.PHONY: native test clean
