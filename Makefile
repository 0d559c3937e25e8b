# Top-level convenience targets (mirrors the reference's Makefile workflow)

PYTHON ?= python

all: native test

native:
	$(MAKE) -C csrc

test:
	$(PYTHON) -m pytest tests/ -q

test-fast:
	$(PYTHON) -m pytest tests/ -q -m "not slow"

# Pallas-kernel parity tests on the real TPU (kept out of the default CPU run)
test-tpu:
	GRAYSKULL_TEST_TPU=1 $(PYTHON) -m pytest tests/ -q -m tpu

bench:
	$(PYTHON) bench.py

bench-all:
	$(PYTHON) benchmarks/bench_all.py

# integration pipeline over real test data, like the reference's `make testdata`
testdata:
	mkdir -p out
	$(PYTHON) -m grayskull_tpu.cli identify $(GRAYSKULL_REF_DIR)/testdata/lena.pgm
	$(PYTHON) -m grayskull_tpu.cli resize 128 64 $(GRAYSKULL_REF_DIR)/testdata/lena.pgm out/lena_128x64.pgm
	$(PYTHON) -m grayskull_tpu.cli blur 1 $(GRAYSKULL_REF_DIR)/testdata/lena.pgm out/lena_blur.pgm
	$(PYTHON) -m grayskull_tpu.cli threshold otsu out/lena_blur.pgm out/lena_otsu.pgm
	$(PYTHON) -m grayskull_tpu.cli scan $(GRAYSKULL_REF_DIR)/testdata/document.pgm out/document.pgm
	$(PYTHON) -m grayskull_tpu.cli faces 2 $(GRAYSKULL_REF_DIR)/testdata/lena.pgm out/lena_faces.pgm

GRAYSKULL_REF_DIR ?= /root/reference

demo:
	$(PYTHON) examples/live_demo.py

goldens:
	$(PYTHON) tools/gen_goldens.py

.PHONY: all native test test-fast test-tpu bench bench-all testdata demo goldens
