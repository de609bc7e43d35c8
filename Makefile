# ptts-tpu build/test entry points (analogue of the reference Makefile).

PY ?= python
TEST_ENV = env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu

.PHONY: all native test test-fast tpu-smoke bench bench-streaming golden parity sanitize clean

all: native

# C++ host library (tokenizer, WAV, dtype converters)
native: ptts_tpu/native/libptts_host.so

ptts_tpu/native/libptts_host.so: csrc/ptts_host.cpp
	g++ -O2 -std=c++17 -shared -fPIC -o $@ $<
	sha256sum csrc/ptts_host.cpp | cut -d' ' -f1 > $@.sha256

# Hermetic test suite: CPU backend, virtual 8-device mesh (tests/conftest.py)
test:
	$(PY) -m pytest tests/ -x -q

# Faster local loop without the TPU-tunnel dial at interpreter start and
# without the multi-second equality/serving tests (marked @pytest.mark.slow)
test-fast:
	$(TEST_ENV) $(PY) -m pytest tests/ -x -q -m "not slow"

# Real-chip smoke gates: accelerated (Pallas/device) paths vs XLA references
# at full model size (role of the reference's tests/test_mps.c; exits 77 = no TPU)
tpu-smoke:
	$(PY) tools/tpu_smoke.py

# Serving throughput on the real chip: prints one JSON line
bench:
	$(PY) bench.py

bench-streaming:
	$(PY) tools/bench_streaming.py

# Golden "Hello world!" regression (needs model assets; exits 77 = skip)
golden:
	$(PY) tools/hello_world_test.py --model-dir $(PTTS_MODEL_DIR)

# EXECUTED parity vs the reference C binary: builds /root/reference out of
# tree, generates a full-size synthetic checkpoint, gates tokens/latents/
# cond/flow/EOS/WAV/bf16 (tools/ref_parity.py; exits 77 = reference absent)
parity:
	$(TEST_ENV) $(PY) tools/ref_parity.py

# Sanitizer sweep (analogue of the reference's cuda-sanitize memcheck,
# Makefile:159-160): interpret-mode Pallas OOB index check, jax_debug_nans
# generate, stage-boundary finite guards + a planted-NaN detection self-test
sanitize:
	$(TEST_ENV) $(PY) tools/sanitize.py

clean:
	rm -f ptts_tpu/native/libptts_host.so ptts_tpu/native/libptts_host.so.sha256
	find . -name __pycache__ -type d -exec rm -rf {} +
