# Developer tasks (the reference uses Taskfile.yml; same idea).

.PHONY: test test-tpu native bench sweep lint clean

test:
	python -m pytest tests/ -q

test-tpu:
	BIRDNET_TEST_TPU=1 python -m pytest tests/ -q

native:
	sh native/build.sh

bench:
	python bench.py

sweep:
	python scripts/batch_sweep.py

lint:
	python -m compileall -q birdnet_tpu tests bench.py __graft_entry__.py

clean:
	rm -rf birdnet_tpu/__pycache__ birdnet_tpu/**/__pycache__ tests/__pycache__ .pytest_cache
