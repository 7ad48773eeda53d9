.PHONY: test test-chaos verify verify-all bench inventory

test:              ## main lane (chaos excluded via pytest.ini addopts) + serial chaos lane
	python -m pytest tests/ -q
	$(MAKE) test-chaos

test-chaos:        ## the two true-thread clean_log chaos tests, alone and serial
	python -m pytest tests/test_checkpoint_parquet.py -q -m chaos

verify:            ## all declared keys vs DuckDB oracle @ sf0.01
	python tools/verify_local.py

verify-all:        ## the same at every scale factor
	SF_DIR=/root/testdata/sf0.001 python tools/verify_local.py
	SF_DIR=/root/testdata/sf0.01  python tools/verify_local.py
	SF_DIR=/root/testdata/sf0.1   python tools/verify_local.py

bench:
	python bench.py

inventory:
	python tools/gen_inventory.py
