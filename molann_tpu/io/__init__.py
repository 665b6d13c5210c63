from .serialize import load_model, save_model
from .export import (export_bundle, export_stablehlo,
                     load_stablehlo, read_bundle)
from .dcd import DCDWriter, read_dcd, write_dcd
from .xdr import (TRRWriter, XTCWriter, read_trr, read_xtc,
                  write_trr, write_xtc)
from .netcdf import (NetCDFReader, NetCDFWriter, read_netcdf,
                     write_netcdf)
from .reader import open_frame_reader
from .torch_import import load_torchscript
from .torch_export import export_torchscript

__all__ = [
    "open_frame_reader",
    "load_torchscript",
    "export_torchscript",
    "save_model",
    "load_model",
    "export_stablehlo",
    "export_bundle",
    "read_bundle",
    "load_stablehlo",
    "read_dcd",
    "write_dcd",
    "read_trr",
    "write_trr",
    "read_xtc",
    "write_xtc",
    "read_netcdf",
    "write_netcdf",
    "DCDWriter",
    "NetCDFReader",
    "NetCDFWriter",
    "TRRWriter",
    "XTCWriter",
]
