"""Model registry: convention-based discovery plus explicit registration
(the create_model machinery of reference models/__init__.py:4-44).

``find_model_using_name('foo_bar')`` imports ``mra_gan_tpu.models.foo_bar``
and returns the class named ``FooBarConfig`` (case/underscore-insensitive
match, mirroring the reference's ``<name>_model.py`` / ``<Name>Model``
convention at reference models/__init__.py:10-25). Model-specific CLI flags
are injected through the class's ``modify_commandline_options(parser,
is_train)`` staticmethod (reference models/__init__.py:28-30,
options/base_options.py:68-72) — adding a model never requires touching the
options layer.
"""
import importlib

from .cycle_gan import (
    CycleGANConfig,
    CycleGANState,
    create_state,
    forward_visuals,
    make_generate_fn,
    make_train_step,
    pool_query,
)
from .networks import (
    DynUNet3D,
    NLayerDiscriminator3D,
    PixelDiscriminator3D,
    ResnetGenerator3D,
    UnetGenerator3D,
    define_d,
    define_g,
)

_MODELS = {}


def register_model(name):
    """Explicit registration decorator (also used as the discovery cache)."""

    def deco(cls):
        _MODELS[name] = cls
        return cls

    return deco


def find_model_using_name(name: str):
    """Resolve a model name to its config class by convention: import
    ``mra_gan_tpu.models.<name>`` and find the class whose name lowercases to
    ``<name-without-underscores>config``."""
    if name in _MODELS:
        return _MODELS[name]
    try:
        module = importlib.import_module(f".{name}", __package__)
    except ImportError as e:
        raise KeyError(
            f"model [{name}] not registered and no module "
            f"mra_gan_tpu/models/{name}.py exists ({e}); "
            f"registered: {sorted(_MODELS)}") from e
    target = name.replace("_", "") + "config"
    for attr, cls in vars(module).items():
        if isinstance(cls, type) and attr.lower() == target:
            _MODELS[name] = cls
            return cls
    raise KeyError(
        f"module mra_gan_tpu/models/{name}.py defines no class named "
        f"~ {name.title().replace('_', '')}Config")


def get_model(name: str):
    return find_model_using_name(name)


def get_option_setter(name: str):
    """The model's CLI-flag injection hook, or None
    (reference models/__init__.py:28-30)."""
    return getattr(find_model_using_name(name), "modify_commandline_options", None)


register_model("cycle_gan")(CycleGANConfig)
