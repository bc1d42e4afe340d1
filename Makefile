.PHONY: test check bench install dist

test:
	scripts/run-tests.sh

check:
	scripts/check-code.sh

bench:
	python bench.py

install:
	pip install -e .

dist:
	python -m build
