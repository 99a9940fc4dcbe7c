# cadre_tpu build/test/bench driver.
CXX ?= g++
CXXFLAGS ?= -O2 -std=c++17 -shared -fPIC
RUNTIME := cadre_tpu/runtime

.PHONY: all native test bench routes clean

all: native

native: $(RUNTIME)/libringbuf.so $(RUNTIME)/libraster.so

$(RUNTIME)/libringbuf.so: $(RUNTIME)/ringbuf.cpp
	$(CXX) $(CXXFLAGS) $< -o $@ -lrt

$(RUNTIME)/libraster.so: $(RUNTIME)/raster.cpp
	$(CXX) $(CXXFLAGS) $< -o $@

test:
	python -m pytest tests/ -q

bench:
	python bench.py

routes:
	python scripts/gen_routes.py --out routes

clean:
	rm -f $(RUNTIME)/*.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
