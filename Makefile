PYTHON ?= python

.PHONY: all native test bench dist clean

all: native

native:
	cd native && $(PYTHON) setup.py build_ext --build-lib ../panvc3_tpu/native_build >/dev/null
	@echo "native extension built into panvc3_tpu/native_build/"

test:
	$(PYTHON) -m pytest tests/ -q

bench:
	$(PYTHON) bench.py

# distributable artifacts (reference parity: conda package + `make dist`
# tarball, /root/reference/Makefile:108-119): a binary wheel with the
# native extension built in, plus a source tarball.  Set PANVC3_MARCH
# (e.g. x86-64-v3) for a portable wheel; default is -march=native.
dist:
	$(PYTHON) -m pip wheel --no-deps --no-build-isolation -w dist .
	$(PYTHON) setup.py -q sdist -d dist
	@ls -l dist

clean:
	rm -rf native/build panvc3_tpu/native_build build dist *.egg-info
