from .spmm import (
    EdgeCutBands,
    pad_coo,
    plan_banded_coo,
    plan_edgecut_coo,
    spmm,
    spmm_inner,
)
from .normalize import l2_normalize, l1_normalize, spectral_normalize, normalize
from .whiten import whiten
from .loop import embed_loop, embed_loop_convergence, embed_step

__all__ = [
    "spmm", "spmm_inner", "pad_coo", "plan_banded_coo",
    "plan_edgecut_coo", "EdgeCutBands",
    "l2_normalize", "l1_normalize", "spectral_normalize", "normalize",
    "whiten", "embed_loop", "embed_loop_convergence", "embed_step",
]
