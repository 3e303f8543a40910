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

profile:
	python scripts/stage_profile.py

bench-models:
	python scripts/bench_models.py

lint:
	python -m compileall -q birdnet_tpu tests bench.py __graft_entry__.py

clean:
	find . -name __pycache__ -type d -prune -exec rm -rf {} +
	rm -rf .pytest_cache
