.PHONY: test bench native validate dryrun clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	$(MAKE) -C native

validate:
	python tools/validate_learning.py

dryrun:
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

clean:
	$(MAKE) -C native clean
	rm -rf .pytest_cache
