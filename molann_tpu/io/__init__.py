from .serialize import load_model, save_model
from .export import export_stablehlo, load_stablehlo
from .dcd import read_dcd, write_dcd

__all__ = [
    "save_model",
    "load_model",
    "export_stablehlo",
    "load_stablehlo",
    "read_dcd",
    "write_dcd",
]
