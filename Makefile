# DeepPhysiNet-TPU build / test targets

NATIVE_SRC := native/src/dpn_native.cc
NATIVE_SO  := native/src/libdpn_native.so

.PHONY: all native test bench smoke clean

all: native

native: $(NATIVE_SO)

$(NATIVE_SO): $(NATIVE_SRC)
	g++ -O3 -march=native -shared -fPIC -fopenmp $< -o $@

test:
	python -m pytest tests/ -q

smoke:
	python train.py --config_file configs/smoke_cpu_cfg.py --max_steps 50

bench:
	python bench.py

clean:
	rm -f $(NATIVE_SO)
	find . -name __pycache__ -type d -exec rm -rf {} +
