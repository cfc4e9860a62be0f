"""Drop-in compatibility shim: the reference's package name, backed by
cleora_tpu.

Lets existing pycleora code run unchanged:

    from pycleora import SparseMatrix, embed
    from pycleora.pycleora import SparseMatrix   # the PyO3 module path
    import pycleora.metrics as metrics

Every public name and submodule re-exports cleora_tpu's implementation.
"""

import sys as _sys

import cleora_tpu as _impl
from cleora_tpu import *  # noqa: F401,F403
from cleora_tpu import (  # noqa: F401
    CleoraEmbedder,
    DEFAULT_FEATURE_DIM,
    DEFAULT_NUM_ITERATIONS,
    SparseMatrix,
    embed,
    whiten_embeddings,
)

__version__ = _impl.__version__

# The reference's native-extension path must be importable as a real module
# (`from pycleora.pycleora import SparseMatrix`), so register it eagerly.
import cleora_tpu.sparse as _sparse_mod

_sys.modules[__name__ + ".pycleora"] = _sparse_mod
pycleora = _sparse_mod

_SUBMODULES = [
    "algorithms", "align", "benchmark", "checkpoint", "classify", "cli",
    "community", "compress", "datasets", "ensemble", "generators", "hetero",
    "io_utils", "metrics", "preprocess", "sampling", "search", "stats",
    "tracing", "tuning", "viz",
]


def __getattr__(name):
    if name in _SUBMODULES:
        import importlib

        mod = importlib.import_module(f"cleora_tpu.{name}")
        _sys.modules[f"{__name__}.{name}"] = mod
        return mod
    return getattr(_impl, name)


# `import pycleora.metrics` (the import STATEMENT, not attribute access) goes
# through the import system, which knows nothing of __getattr__ — register a
# meta-path alias so every reference submodule path imports cleora_tpu's.
import importlib as _importlib
import importlib.abc as _abc
import importlib.util as _util


class _AliasLoader(_abc.Loader):
    def __init__(self, target):
        self._target = target

    def create_module(self, spec):
        return _importlib.import_module(self._target)

    def exec_module(self, module):
        pass  # already executed under its real name


class _AliasFinder(_abc.MetaPathFinder):
    def find_spec(self, fullname, path=None, target=None):
        prefix = __name__ + "."
        if not fullname.startswith(prefix):
            return None
        sub = fullname[len(prefix):]
        if sub == "pycleora":  # the PyO3 extension path
            return _util.spec_from_loader(fullname, _AliasLoader("cleora_tpu.sparse"))
        if sub in _SUBMODULES:
            return _util.spec_from_loader(fullname, _AliasLoader(f"cleora_tpu.{sub}"))
        return None


_sys.meta_path.append(_AliasFinder())
