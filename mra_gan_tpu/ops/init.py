"""Weight initializers matching the reference's ``init_weights`` schemes
(reference models/networks3D.py:44-65): normal / xavier / kaiming / orthogonal,
applied to conv kernels; biases zero.

Kernels are NDHWC-layout (kd,kh,kw,Cin,Cout): fan_in = Cin*kd*kh*kw,
fan_out = Cout*kd*kh*kw — same fans torch computes for NCDHW weights.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _fans(shape):
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    fan_in = shape[-2] * receptive
    fan_out = shape[-1] * receptive
    return fan_in, fan_out


def normal_init(gain: float = 0.02):
    def init(key, shape, dtype=jnp.float32):
        return gain * jax.random.normal(key, shape, dtype)

    return init


def xavier_normal_init(gain: float = 0.02):
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fans(shape)
        std = gain * np.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, dtype)

    return init


def kaiming_normal_init():
    # torch kaiming_normal_(a=0, mode='fan_in'): std = sqrt(2/fan_in)
    def init(key, shape, dtype=jnp.float32):
        fan_in, _ = _fans(shape)
        std = np.sqrt(2.0 / fan_in)
        return std * jax.random.normal(key, shape, dtype)

    return init


def orthogonal_init(gain: float = 0.02):
    def init(key, shape, dtype=jnp.float32):
        # torch flattens trailing dims: rows = out, cols = everything else.
        n_rows = shape[-1]
        n_cols = int(np.prod(shape)) // n_rows
        flat = jax.random.normal(key, (max(n_rows, n_cols), min(n_rows, n_cols)), jnp.float32)
        q, r = jnp.linalg.qr(flat)
        q = q * jnp.sign(jnp.diagonal(r))
        if n_rows < n_cols:
            q = q.T
        return (gain * q.reshape(shape[::-1]).T.reshape(shape)).astype(dtype)

    return init


def get_initializer(init_type: str = "normal", gain: float = 0.02):
    if init_type == "normal":
        return normal_init(gain)
    if init_type == "xavier":
        return xavier_normal_init(gain)
    if init_type == "kaiming":
        return kaiming_normal_init()
    if init_type == "orthogonal":
        return orthogonal_init(gain)
    raise NotImplementedError(f"initialization method [{init_type}] is not implemented")
