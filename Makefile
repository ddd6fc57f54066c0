# Build/validate flow (reference analog: C11, the SDAccel Makefile tiers —
# SURVEY.md SS2/SS4): sw_emu -> tests (CPU interpret), hw -> tpu_smoke + bench.

.PHONY: test oracle verify smoke bench sweep clean

oracle:            ## build the native C++ golden oracle
	python -c "from mobilenet_tpu import cpu_ref; print(cpu_ref.build(force=True))"

test: oracle       ## sw_emu tier: full pytest suite on the CPU backend
	python -m pytest tests/ -q

verify:            ## per-layer golden gates (fp32 tolerance + int8 exact)
	python -m mobilenet_tpu.cli --backend cpu verify --alpha 0.25 --res 128
	python -m mobilenet_tpu.cli --backend cpu verify --alpha 0.25 --res 128 --int8

smoke:             ## hw tier: all Pallas kernel families on the real TPU
	python tools/tpu_smoke.py

bench:             ## the driver contract metric (one JSON line, real TPU)
	python bench.py

sweep:             ## full alpha x resolution grid (real TPU, slow)
	python -m mobilenet_tpu.cli sweep --steps 15

clean:
	rm -f mobilenet_tpu/cpu_ref/libcpuref.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
