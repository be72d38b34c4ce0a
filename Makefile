.PHONY: native test bench dryrun clean

native:
	./native/build.sh

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow"

bench:
	python bench.py

dryrun:
	python __graft_entry__.py 8

clean:
	rm -rf native/libimagepipe.so .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
