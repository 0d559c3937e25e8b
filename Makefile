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

# integration pipeline over real test data — 1:1 with the reference's
# `make testdata` (/root/reference/Makefile:10-33), plus a faces run
NM = $(PYTHON) -m grayskull_tpu.cli
TD = $(GRAYSKULL_REF_DIR)/testdata

testdata:
	mkdir -p out
	$(NM) identify $(TD)/grayskull.pgm
	$(NM) view $(TD)/grayskull.pgm
	$(NM) identify $(TD)/lena.pgm
	$(NM) resize 128 64 $(TD)/lena.pgm out/lena_128x64.pgm
	$(NM) crop 32 32 64 64 $(TD)/lena.pgm out/lena_crop.pgm
	$(NM) blur 1 $(TD)/lena.pgm out/lena_blur.pgm
	$(NM) blur 9 $(TD)/lena.pgm out/lena_blur_9.pgm
	$(NM) threshold 128 out/lena_blur.pgm out/lena_threshold_128.pgm
	$(NM) threshold otsu out/lena_blur.pgm out/lena_otsu.pgm
	$(NM) adaptive 15 5 $(TD)/lena.pgm out/lena_adaptive.pgm
	$(NM) morph erode 2 out/lena_otsu.pgm out/lena_erode.pgm
	$(NM) morph dilate 2 out/lena_erode.pgm out/lena_dilate.pgm
	$(NM) sobel $(TD)/lena.pgm - | $(NM) view -
	$(NM) blur 3 $(TD)/aruco.pgm - | \
		$(NM) sobel - - | \
		$(NM) threshold otsu - - | \
		$(NM) morph dilate 9 - - | \
		$(NM) morph erode 10 - - | \
		$(NM) blobs 150 - out/aruco.pgm
	$(NM) view out/aruco.pgm
	$(NM) scan $(TD)/document.pgm out/document.pgm
	$(NM) scan $(TD)/receipt.pgm out/receipt.pgm
	$(NM) faces 2 $(TD)/lena.pgm out/lena_faces.pgm

GRAYSKULL_REF_DIR ?= /root/reference

demo:
	$(PYTHON) examples/live_demo.py

goldens:
	$(PYTHON) tools/gen_goldens.py

.PHONY: all native test test-fast test-tpu bench bench-all testdata demo goldens
