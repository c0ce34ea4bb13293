"""Step/data timing (the reference only has wall-clock prints, reference
train.py:111-113); profiler traces are driven directly by train.py
--profile_dir."""
from __future__ import annotations

import time

import jax


class StepTimer:
    """Tracks compute and data-wait durations per iteration."""

    def __init__(self):
        self._last = time.perf_counter()
        self.t_data = 0.0
        self.t_comp = 0.0

    def data_ready(self):
        now = time.perf_counter()
        self.t_data = now - self._last
        self._last = now

    def step_done(self):
        now = time.perf_counter()
        self.t_comp = now - self._last
        self._last = now


def count_params(tree) -> int:
    import numpy as np

    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(tree)
                   if hasattr(x, "shape")))


def print_networks(state, verbose: bool = False) -> None:
    """Parameter-count summary at startup (the reference's print_networks,
    reference models/base_model.py:151-162)."""
    print("---------- Networks initialized -------------")
    for group, params in (("G_A", state.g_params["g_a"]),
                          ("G_B", state.g_params["g_b"]),
                          ("D_A", state.d_params["d_a"]),
                          ("D_B", state.d_params["d_b"])):
        n = count_params(params)
        if verbose:
            import jax as _jax

            for path, leaf in _jax.tree_util.tree_flatten_with_path(params)[0]:
                name = "/".join(str(getattr(p, "key", p)) for p in path)
                print(f"  {group}/{name}: {tuple(leaf.shape)}")
        print(f"[Network {group}] Total number of parameters : {n / 1e6:.3f} M")
    print("-----------------------------------------------")
