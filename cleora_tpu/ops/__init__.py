from .spmm import spmm, spmm_inner, pad_coo
from .normalize import l2_normalize, l1_normalize, spectral_normalize, normalize
from .whiten import whiten
from .loop import embed_loop, embed_loop_convergence, embed_step

__all__ = [
    "spmm", "spmm_inner", "pad_coo",
    "l2_normalize", "l1_normalize", "spectral_normalize", "normalize",
    "whiten", "embed_loop", "embed_loop_convergence", "embed_step",
]
