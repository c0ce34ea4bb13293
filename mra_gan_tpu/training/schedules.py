"""Learning-rate policies matching the reference's get_scheduler
(reference models/networks3D.py:27-41). All are *epoch-level* host-side
functions — the jitted train step takes lr as an argument, so schedules never
force recompilation.

- lambda:  lr * (1 - max(0, epoch+1+epoch_count-niter) / (niter_decay+1))
- step:    lr * 0.1^(epoch // lr_decay_iters)
- plateau: ReduceLROnPlateau(mode=min, factor=0.2, threshold=0.01, patience=5)
- cosine:  0.5 * lr * (1 + cos(pi * epoch / niter))
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field


@dataclass
class LRScheduler:
    policy: str
    base_lr: float
    niter: int = 500
    niter_decay: int = 100
    epoch_count: int = 1
    lr_decay_iters: int = 50
    # plateau state
    _best: float = field(default=math.inf)
    _num_bad: int = field(default=0)
    _plateau_lr: float = field(default=0.0)

    def __post_init__(self):
        self._plateau_lr = self.base_lr

    def lr_for_epoch(self, epoch: int, metric: float | None = None) -> float:
        """lr to use *during* ``epoch`` (1-based, like the reference loop).

        torch steps the scheduler after each epoch; LambdaLR evaluates the
        lambda at last_epoch which starts at 0 — so epoch N (1-based) trains
        at lambda(N-1). We evaluate directly for the current epoch.
        """
        if self.policy == "lambda":
            e = epoch - 1  # scheduler's last_epoch during this epoch
            factor = 1.0 - max(0, e + 1 + self.epoch_count - self.niter) / float(
                self.niter_decay + 1)
            return self.base_lr * factor
        if self.policy == "step":
            e = epoch - 1
            return self.base_lr * (0.1 ** (e // self.lr_decay_iters))
        if self.policy == "plateau":
            if metric is not None:
                # threshold-relative 'min' mode, factor 0.2, patience 5
                if metric < self._best * (1 - 0.01):
                    self._best = metric
                    self._num_bad = 0
                else:
                    self._num_bad += 1
                    if self._num_bad > 5:
                        self._plateau_lr *= 0.2
                        self._num_bad = 0
            return self._plateau_lr
        if self.policy == "cosine":
            e = epoch - 1
            return 0.5 * self.base_lr * (1 + math.cos(math.pi * e / self.niter))
        raise NotImplementedError(f"learning rate policy [{self.policy}] is not implemented")
