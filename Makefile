# Port of the reference Makefile (reference Makefile:22-41)

.PHONY: test test-full test-tpu train debug clean bench

test:            ## fast tests only
	python -m pytest tests/ -q -m "not slow and not tpu"

test-full:       ## all tests incl. slow parity checks (CPU mesh)
	python -m pytest tests/ -q

test-tpu:        ## compile-smoke the Pallas kernels on the real chip
	python -m pytest tests/ -q -m tpu

train:           ## smoke-train on synthetic data
	python scripts/train.py datamodule=synthetic trainer.max_epochs=3

debug:           ## 1-epoch debug preset with NaN checks
	python scripts/train.py debug=default datamodule=synthetic

bench:           ## headline benchmark (one JSON line)
	python bench.py

clean:           ## remove caches and logs
	rm -rf logs/ .pytest_cache
	find . -type d -name __pycache__ -exec rm -rf {} +
