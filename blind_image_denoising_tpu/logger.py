"""stdlib logger under the package namespace (reference custom_logger.py:7-14)."""

import logging

_FORMAT = "%(asctime)s %(levelname)-4s %(filename)s:%(funcName)s:%(lineno)s] %(message)s"

logging.basicConfig(level=logging.INFO, format=_FORMAT)
logger = logging.getLogger("bfcnn_tpu")
logger.setLevel(logging.INFO)
