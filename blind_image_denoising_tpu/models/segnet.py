"""SegNet backbone — unimplemented stub, matching the reference
(backbone_segnet.py:14-17)."""

from typing import Any, Dict

import flax.linen as nn


class SegnetBackbone(nn.Module):
    config: Dict[str, Any]
    dtype: Any = None

    def __call__(self, x, train: bool = False):
        raise NotImplementedError("segnet backbone is not implemented "
                                  "(stub, as in the reference)")
