"""TestModel config: inference-only flag injection, discovered by the
registry convention as model name 'test' (the reference's TestModel,
reference models/test_model.py:7-21).

The runtime half of TestModel — restore one generator, forward patches —
lives in make_generate_fn (models/cycle_gan.py) + test.py's inference();
this class only carries the CLI hook, mirroring the reference's
modify_commandline_options: reuse CycleGAN's (eval-mode) flags and add
--model_suffix selecting which saved generator to run
(reference models/test_model.py:12-21).
"""
from __future__ import annotations

from .cycle_gan import CycleGANConfig


class TestConfig:
    @staticmethod
    def modify_commandline_options(parser, is_train: bool):
        assert not is_train, "TestModel cannot be used in train mode"
        parser = CycleGANConfig.modify_commandline_options(parser, is_train=False)
        parser.add_argument("--model_suffix", type=str, default="_A",
                            help="which saved generator to run: _A (A->B) or "
                                 "_B (B->A) — the mechanized version of the "
                                 "reference's checkpoint-renaming instruction "
                                 "(reference README.md:82-83)")
        return parser
