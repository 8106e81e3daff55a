# dev commands (the reference ships a justfile; same idea)
.PHONY: test test-fast bench dataset-bench native native-all ci lint clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -k "not Patchwork and not Multiscale"

bench:
	python bench.py

dataset-bench:
	python benchmarks/dataset_bench.py --synthetic 1000000 --tasks voxel,normals,knn,icp

native:
	g++ -O3 -shared -fPIC -std=c++17 -o threecrate_tpu/native/libtc_native.so threecrate_tpu/native/tc_native.cpp

native-all: native
	g++ -O3 -shared -fPIC -std=c++17 -o threecrate_tpu/native/libtc_laz.so threecrate_tpu/native/tc_laz.cpp

# the exact steps .github/workflows/test.yml runs (local CI dry run)
ci: native-all lint test

lint:
	python -m compileall -q threecrate_tpu

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; rm -f threecrate_tpu/native/libtc_native.so
