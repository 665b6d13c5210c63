from .serialize import load_model, save_model
from .export import export_stablehlo, load_stablehlo

__all__ = ["save_model", "load_model", "export_stablehlo", "load_stablehlo"]
