PYTHON ?= python

.PHONY: all native test bench clean

all: native

native:
	cd native && $(PYTHON) setup.py build_ext --build-lib ../panvc3_tpu/native_build >/dev/null
	@echo "native extension built into panvc3_tpu/native_build/"

test:
	$(PYTHON) -m pytest tests/ -q

bench:
	$(PYTHON) bench.py

clean:
	rm -rf native/build panvc3_tpu/native_build
