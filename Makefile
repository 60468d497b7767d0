# DiffCodec-TPU convenience targets

.PHONY: test test-fast bench bench-small native entry dryrun clean-cache

test:
	python -m pytest tests/ -q

test-fast:  ## <10 min iteration lane (skips the marked slow tier)
	python -m pytest tests/ -q -x -m "not slow"

bench:          ## flagship 512px GOP-batch decode throughput (TPU)
	python bench.py

bench-small:
	BENCH_SMALL=1 python bench.py

native:
	$(MAKE) -C native

entry:
	python __graft_entry__.py

dryrun:
	python __graft_entry__.py multichip 8

clean-cache:
	rm -rf .jax_cache
