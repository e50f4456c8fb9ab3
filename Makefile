# CI entry points (the reference's .travis.yml:5-7 analog:
# build + full-tier test run; release mode un-gates the corpus grid).
#
# The unit tiers force the CPU backend with an 8-device virtual mesh
# (tests/conftest.py); bench targets use the real TPU chip.

PY ?= python
PYTEST = JAX_PLATFORMS=cpu PYTHONPATH=. $(PY) -m pytest

.PHONY: test test-release bench-smoke bench bench-preflight scaling multihost fuzz ci

# Fast tier: every unit/differential/integration test that runs in debug
# builds of the reference (artificial corpus included, grid gated).
test:
	$(PYTEST) tests/ -q

# Release tier: adds the full corpus x config grid + the size contract
# (the reference's `cargo test --release`).
test-release:
	$(PYTEST) tests/ -q --runslow -s

# One-file sanity bench on the current backend (CPU works; slow).
bench-smoke:
	PYTHONPATH=.:$$PYTHONPATH $(PY) bench.py --smoke

# Compiled-mode kernel preflight: the Mosaic kernels must round-trip
# bit-exactly on the real chip before any number is trusted (auto-skips
# on machines without an accelerator).
bench-preflight:
	$(PYTEST) tests/test_tpu_hardware.py -q

# Full benchmark (driver contract: one JSON line; real TPU).
bench: bench-preflight
	PYTHONPATH=.:$$PYTHONPATH $(PY) bench.py

scaling:
	JAX_PLATFORMS=cpu PYTHONPATH=.:$$PYTHONPATH $(PY) scripts/scaling_bench.py

# Bounded randomized differential bug hunt (default 20 minutes):
# Pallas kernel variants + generic device-path coders vs the oracle.
fuzz:
	PYTHONPATH= $(PY) scripts/fuzz_campaign.py $(or $(MINUTES),20)

ci: test bench-smoke
