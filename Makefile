# Convenience targets (the build layer; native code builds lazily on import
# too — see fluidsolver_tpu/native/__init__.py)

.PHONY: test test-full test-reference bench native clean

test:
	python -m pytest tests/ -x -q

test-full:
	python -m pytest tests/ -q -m ""

test-reference:
	FS_FULL_TESTS=1 python -m pytest tests/ -q -m ""

bench:
	python bench.py

native:
	sh fluidsolver_tpu/native/build.sh

clean:
	rm -rf output/ fluidsolver_tpu/native/libfs_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
