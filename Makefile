.PHONY: test verify verify-all bench inventory

test:
	python -m pytest tests/ -q

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
