from .io import fold_bn, init_params, load_npz, save_npz, to_device


def default_folded(config, seed: int = 0):
    """Seeded reference weight set, folded, for ANY model-family config —
    dispatches on the config type the way the runtime does."""
    from ..models.mobilenet_v2 import V2Config
    from ..models.mobilenet_v3 import V3Config

    if isinstance(config, V2Config):
        from .v2 import fold_bn_v2, init_params_v2

        return fold_bn_v2(init_params_v2(config, seed=seed), eps=config.bn_eps)
    if isinstance(config, V3Config):
        from .v3 import fold_bn_v3, init_params_v3

        return fold_bn_v3(init_params_v3(config, seed=seed), eps=config.bn_eps)
    return fold_bn(init_params(config, seed=seed), eps=config.bn_eps)


__all__ = ["init_params", "fold_bn", "save_npz", "load_npz", "to_device",
           "default_folded"]
