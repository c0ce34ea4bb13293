"""Model registry (the create_model equivalent,
reference models/__init__.py:4-44): name -> (config class, factory)."""
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
    def deco(cls):
        _MODELS[name] = cls
        return cls

    return deco


def get_model(name):
    if name not in _MODELS:
        raise KeyError(f"model [{name}] not registered; have {sorted(_MODELS)}")
    return _MODELS[name]


register_model("cycle_gan")(CycleGANConfig)
