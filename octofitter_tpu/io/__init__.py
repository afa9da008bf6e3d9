"""I/O: FITS tables, chain save/load, Orbitize! interop."""

from .fits import read_bintable, write_bintable, read_header
from .chains_io import savechain, loadchain

__all__ = [
    "read_bintable",
    "write_bintable",
    "read_header",
    "savechain",
    "loadchain",
]
