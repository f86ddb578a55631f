"""Architecture registry.

The reference selects architectures by name via
``importlib.import_module(f'networks.{arch}.generator')``
(reference SURFGAN_3D/optuna_objective.py:64-65).  We use an explicit
registry; every architecture exposes one calling convention (SURVEY.md §2
notes the reference left the non-pgan models on an older signature — the
rebuild unifies them):

    init(rng, *, phase, cfg)                 -> flat Params dict (G+D; split
                                                by scope prefix via
                                                core.split_params)
    generator(params, z, alpha, *, phase, cfg, rng=None)   -> images
    discriminator(params, x, alpha, *, phase, cfg)         -> (N, 1) scores

``cfg`` is a `saragan_tpu.config.Config` (or any namespace with the
architecture fields: base_shape, latent_dim, kernel_spec, filter_spec,
activation, leakiness, network_size, ...).
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple


class Architecture(NamedTuple):
    name: str
    init: Callable
    generator: Callable
    discriminator: Callable
    # Optional per-train-step non-gradient state refresh:
    # refresh_state(g_params, rng, *, phase, cfg) -> g_params.  Style
    # architectures use it to track the w-average (`d_z_avg`) the way the
    # reference's in-graph tf.assign did (stylegan/generator.py:29-37);
    # None for architectures without such state.
    refresh_state: Callable = None


_REGISTRY: Dict[str, Architecture] = {}


def register(arch: Architecture) -> Architecture:
    _REGISTRY[arch.name] = arch
    return arch


def get_architecture(name: str) -> Architecture:
    # import for registration side effects
    import saragan_tpu.models.pgan  # noqa: F401

    try:
        import saragan_tpu.models.pgan2  # noqa: F401
        import saragan_tpu.models.pgandeep  # noqa: F401
        import saragan_tpu.models.stylegan  # noqa: F401
        import saragan_tpu.models.stylegan2  # noqa: F401
        import saragan_tpu.models.surfgan  # noqa: F401
    except ImportError:
        pass
    if name not in _REGISTRY:
        raise ValueError(f"Unknown architecture {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]
