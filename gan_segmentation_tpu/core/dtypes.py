"""Dtype policy: parameters in float32, compute in bfloat16 on TPU.

The reference runs everything fp32 (`seg_solver.py:130`, `image_generator.py:72`
``cfg['dtype'] = 'fp32'``); on TPU the MXU natively consumes bfloat16, so the
default policy here keeps master parameters/optimizer state in f32 and casts
activations+weights to bf16 inside the forward pass. Normalization statistics
(instance/batch norm moments, pixel-norm denominators) are always computed in
f32 for numerical parity with the fp32 reference.
"""

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # dtype used for reductions (norm statistics, losses, metrics)
    reduce_dtype: jnp.dtype = jnp.float32

    def cast(self, x):
        return x.astype(self.compute_dtype)


def default_policy(dtype: str = "bf16") -> DTypePolicy:
    """Map the reference's ``cfg['dtype']`` strings to a policy.

    'fp32' -> all-f32 (bit-comparable to reference semantics)
    'bf16' -> f32 params, bf16 compute (TPU default)
    'fp16' -> f32 params, f16 compute (accepted for CLI compatibility with
              deeplab's ``--dtype float16``, `cmd_args.py:23-24`)
    """
    if dtype in ("fp32", "float32"):
        return DTypePolicy(compute_dtype=jnp.float32)
    if dtype in ("bf16", "bfloat16"):
        return DTypePolicy(compute_dtype=jnp.bfloat16)
    if dtype in ("fp16", "float16"):
        return DTypePolicy(compute_dtype=jnp.float16)
    raise ValueError(f"unknown dtype policy: {dtype}")
