.PHONY: test test-all bench train-v6 clean

# default tier: excludes the `slow` end-to-end tests (pytest.ini addopts)
test:
	python -m pytest tests/ -x -q

# full tier: everything, including acceptance product + multihost cohorts
test-all:
	python -m pytest tests/ -x -q -m ""

bench:
	python bench.py

train-v6:
	python -m blind_image_denoising_tpu.train \
		--pipeline-config blind_image_denoising_tpu/configs/unet_laplacian_v6.json \
		--checkpoint-directory runs/unet_laplacian_v6

clean:
	find . -name __pycache__ -type d -exec rm -rf {} +
