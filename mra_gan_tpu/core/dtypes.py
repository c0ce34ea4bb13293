"""Mixed-precision policy.

TPU MXU peaks in bfloat16; params and optimizer state stay float32 and the
forward/backward compute runs in the policy's compute dtype. Losses are always
reduced in float32.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype
    compute_dtype: jnp.dtype

    def cast_to_compute(self, tree):
        import jax

        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


_POLICIES = {
    "float32": Policy(jnp.float32, jnp.float32),
    "bfloat16": Policy(jnp.float32, jnp.bfloat16),
}


def get_policy(name: str = "bfloat16") -> Policy:
    if name not in _POLICIES:
        raise ValueError(f"unknown precision policy {name!r}; options: {list(_POLICIES)}")
    return _POLICIES[name]
