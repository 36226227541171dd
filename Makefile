# mirrors the reference's Makefile targets (reference Makefile:12-13)
.PHONY: test bench pipeline clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

pipeline:
	python scripts/run_pipeline.py --master 'local[8]' \
	  --generate-convs 1000 --input .bench/demo/in \
	  --output .bench/demo/out --state .bench/demo/state

clean:
	rm -rf .bench .pytest_cache $(shell find . -name __pycache__)
