from .io import fold_bn, init_params, load_npz, save_npz, to_device

__all__ = ["init_params", "fold_bn", "save_npz", "load_npz", "to_device"]
