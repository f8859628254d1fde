# Developer entry points (reference Makefile:9-45 equivalents).

.PHONY: all install native test test-fast bench lint fmt clean

all: native test

install:
	pip install -e . --no-build-isolation

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -k "not cli and not model_types"

bench:
	python bench.py

lint:
	python -m flake8 soccdpt_tpu tests --max-line-length 100 || true

fmt:
	python -m black soccdpt_tpu tests || true

clean:
	rm -rf build dist *.egg-info .pytest_cache
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
