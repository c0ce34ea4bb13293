"""Options layer + model registry tests: two-phase parse with model-driven
flag injection, and the reference-faithful (inverted) --no_lsgan default."""
import pytest

from mra_gan_tpu import models as models_pkg
from mra_gan_tpu.models import CycleGANConfig, find_model_using_name, get_option_setter
from mra_gan_tpu.options import TestOptions, TrainOptions


def _parse_train(tmp_path, extra=()):
    return TrainOptions().parse(
        ["--checkpoints_dir", str(tmp_path), *extra])


def test_registry_convention_discovery():
    # bypass the explicit-registration cache to exercise module discovery
    saved = dict(models_pkg._MODELS)
    try:
        models_pkg._MODELS.clear()
        assert find_model_using_name("cycle_gan") is CycleGANConfig
        models_pkg._MODELS.clear()
        assert get_option_setter("test") is not None
        with pytest.raises(KeyError, match="no module"):
            find_model_using_name("definitely_not_a_model")
    finally:
        models_pkg._MODELS.clear()
        models_pkg._MODELS.update(saved)


def test_model_injects_flags(tmp_path):
    opt = _parse_train(tmp_path)
    # flags injected by CycleGANConfig.modify_commandline_options, not by the
    # options layer (reference models/cycle_gan_model.py:42-62)
    assert opt.lambda_A == 10.0 and opt.lambda_B == 10.0
    assert opt.lambda_identity == 0.5
    assert opt.lambda_co_A == 2.0 and opt.lambda_co_B == 2.0
    assert opt.no_dropout is True  # set_defaults override


def test_test_model_injects_model_suffix(tmp_path):
    opt = TestOptions().parse(["--checkpoints_dir", str(tmp_path)])
    assert opt.model == "test"
    assert opt.model_suffix == "_A"
    assert opt.no_dropout is True


def test_no_lsgan_default_matches_reference(tmp_path):
    """The reference's --no_lsgan is store_false (reference
    options/train_options.py:19): DEFAULT no_lsgan=True = vanilla GAN +
    sigmoid D (reference models/cycle_gan_model.py:93,103); passing the flag
    selects LSGAN."""
    from train import config_from_opt

    opt = _parse_train(tmp_path)
    assert opt.no_lsgan is True
    assert config_from_opt(opt).gan_mode == "vanilla"

    opt = _parse_train(tmp_path, ["--no_lsgan"])
    assert opt.no_lsgan is False
    assert config_from_opt(opt).gan_mode == "lsgan"


def test_library_default_objective_matches_cli_default(tmp_path):
    """A library user (bare CycleGANConfig()) and a CLI user (bare
    `python train.py`) must train the SAME objective — the defaults diverged
    until r5 (library lsgan vs CLI vanilla), silently training different
    GANs depending on the entry point."""
    from train import config_from_opt

    from mra_gan_tpu.models.cycle_gan import CycleGANConfig

    assert CycleGANConfig().gan_mode == config_from_opt(
        _parse_train(tmp_path)).gan_mode == "vanilla"


def test_suffix_templating(tmp_path):
    opt = _parse_train(tmp_path, ["--suffix", "{model}_{netG}"])
    assert opt.name.endswith("cycle_gan_resnet_6blocks")
