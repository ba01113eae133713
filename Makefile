.PHONY: test test-quick bench native validate dryrun clean

test:
	python -m pytest tests/ -q

# quick tier: skips the heavy compile / TF-dependent suites (~5 min)
test-quick:
	python -m pytest tests/ -q -m "not slow"

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
