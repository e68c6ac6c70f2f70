"""Runtime weight scaling ("wscale" / equalized learning rate).

Reference `networks_stylegan.py:399-404,505-511`: stored weights are unit
scale; the forward pass multiplies by ``std = gain / sqrt(fan_in)`` (He
constant) and additionally by ``lr_mult`` (0.01 for the mapping MLP,
`image_generator.py:42`). Both multipliers are folded into a single scalar
here and applied to the weight before the matmul/conv so XLA constant-folds
it into the kernel when weights are static.
"""

import numpy as np


def he_fan_in(shape_hwio) -> int:
    """fan_in = kh*kw*Cin for conv HWIO, or in_features for dense (in, out)."""
    if len(shape_hwio) == 4:
        kh, kw, cin, _ = shape_hwio
        return kh * kw * cin
    if len(shape_hwio) == 2:
        return shape_hwio[0]
    raise ValueError(f"unsupported weight shape {shape_hwio}")


def wscale_std(shape_hwio, gain: float = np.sqrt(2), fan_in=None) -> float:
    if fan_in is None:
        fan_in = he_fan_in(shape_hwio)
    return float(gain / np.sqrt(fan_in))
