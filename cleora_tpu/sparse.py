"""SparseMatrix — the hypergraph transition matrix, TPU-resident.

API parity with the reference PyO3 class ``pycleora.SparseMatrix``
(/root/reference/src/lib.rs:84-476): same constructors, methods, getters, and
pickle support.  The numeric state is the host CSR built by
``cleora_tpu.graph.builder``; device COO buffers (row-sorted, padded) are
cached lazily per Markov type and shared by all propagate/embed calls.

Differences by design (TPU-first, documented):
* propagation and the fused embed loops run on the TPU via JAX (XLA), not a
  rayon thread pool; ``num_workers`` is accepted for API compatibility and
  ignored on device.
* graph building is deterministic regardless of worker count (the reference's
  multi-file async path is order-nondeterministic; see builder.py).
"""

from __future__ import annotations

import pickle
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np

from ._util import to_host
from .graph.builder import GraphData, build_graph
from .graph.columns import RelationDescriptor
from .graph.hashing import init_embeddings


def _require_jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


def _build_dispatch(lines, columns, hyperedge_trim_n, num_workers):
    """Prefer the C++ ingest core; fall back to the vectorized-numpy builder
    (CLEORA_TPU_NATIVE=0 forces the fallback)."""
    if not lines:
        raise ValueError("No valid hyperedge lines provided")
    try:
        from .graph.native import build_graph_native, native_available

        if native_available():
            return build_graph_native(lines, columns, hyperedge_trim_n,
                                      num_workers)
    except ValueError:
        raise
    except Exception as e:  # pragma: no cover - defensive fallback
        import warnings

        warnings.warn(f"native builder failed, using numpy fallback: {e}")
    return build_graph(lines, columns, hyperedge_trim_n, num_workers)


class SparseMatrix:
    """CSR-like Markov transition matrix over hashed entities."""

    def __init__(self, *args):
        # Parity: only the empty constructor is public (for unpickling);
        # use from_iterator / from_files (src/lib.rs:440-461).
        if args:
            raise ValueError(
                "SparseMatrix cannot be constructed directly. "
                "Use SparseMatrix.from_files() or SparseMatrix.from_iterator()."
            )
        self._data: Optional[GraphData] = None
        self._device_cache = {}

    # ------------------------------------------------------------------ build
    @classmethod
    def _from_graph_data(cls, data: GraphData) -> "SparseMatrix":
        sm = cls()
        sm._data = data
        return sm

    @staticmethod
    def from_iterator(
        hyperedges: Iterable[str],
        columns: str,
        hyperedge_trim_n: int = 16,
        num_workers: Optional[int] = None,
    ) -> "SparseMatrix":
        lines = []
        for line in hyperedges:
            if not isinstance(line, str):
                raise ValueError("Iterator elements must be strings")
            if "\n" in line:
                # one iterator element IS one line — an embedded newline
                # would silently mean different graphs on the native path
                # (splits into two lines) vs the numpy fallback / reference
                # (newline becomes part of an entity id)
                raise ValueError(
                    "Iterator elements must be single lines without '\\n' "
                    "(split multi-line strings before feeding, and strip "
                    "trailing newlines from file-read lines)"
                )
            lines.append(line)
        data = _build_dispatch(lines, columns, hyperedge_trim_n, num_workers)
        return SparseMatrix._from_graph_data(data)

    @staticmethod
    def from_edge_arrays(
        src,
        dst,
        columns: str = "complex::reflexive::node",
        hyperedge_trim_n: int = 16,
    ) -> "SparseMatrix":
        """Build directly from integer edge arrays (e.g. SNAP/OGB loaders'
        ``_LazyEdgeList.arrays()``), identical to feeding ``f"{s} {d}"``
        lines without per-edge Python string objects.  Dispatches to the C++
        core via one vectorized text buffer when available; otherwise uses
        the pure-numpy pair builder."""
        s = np.asarray(src)
        d = np.asarray(dst)
        if s.shape != d.shape or s.ndim != 1:
            raise ValueError("src and dst must be 1-D arrays of equal length")
        if s.shape[0] == 0:
            raise ValueError("No valid hyperedge lines provided")
        try:
            from .graph.native import native_available

            if native_available():
                import numpy as _np

                from .graph.columns import parse_fields

                cols = parse_fields(columns)
                if len(cols) == 1 and cols[0].reflexive:
                    # minimal decimal width keeps the U-array conversion cheap
                    w = max(
                        len(str(int(s.max()))), len(str(int(d.max()))),
                        len(str(int(s.min()))), len(str(int(d.min()))),
                    )
                    lines_arr = _np.char.add(
                        _np.char.add(s.astype(f"U{w}"), " "),
                        d.astype(f"U{w}"),
                    )
                    buf = "\n".join(lines_arr.tolist())
                    from .graph.native import build_graph_native

                    return SparseMatrix._from_graph_data(
                        build_graph_native([buf], columns, hyperedge_trim_n)
                    )
        except ValueError:
            raise
        except Exception:  # pragma: no cover - defensive fallback
            pass

        from .graph.builder import build_graph_pairs

        return SparseMatrix._from_graph_data(
            build_graph_pairs(src, dst, columns, hyperedge_trim_n)
        )

    @staticmethod
    def from_files(
        filepaths: Sequence[str],
        columns: str,
        hyperedge_trim_n: int = 16,
        num_workers: Optional[int] = None,
    ) -> "SparseMatrix":
        if not filepaths:
            raise ValueError("At least one file path is required")
        for fp in filepaths:
            if not (fp.endswith(".tsv") or fp.endswith(".csv") or fp.endswith(".txt")):
                raise ValueError(
                    f"Unsupported file format: {fp}. Supported: .tsv, .csv, .txt"
                )

        readable = []
        for fp in filepaths:
            try:
                open(fp, "rb").close()
                readable.append(fp)
            except OSError as e:  # parity: log-and-skip unreadable files
                import warnings

                warnings.warn(f"Cannot open file '{fp}': {e}")

        try:
            from .graph.native import build_graph_native_files, native_available

            if native_available() and readable:
                return SparseMatrix._from_graph_data(
                    build_graph_native_files(
                        readable, columns, hyperedge_trim_n, num_workers
                    )
                )
        except ValueError:
            raise
        except Exception as e:  # pragma: no cover - defensive fallback
            import warnings

            warnings.warn(f"native file builder failed, using fallback: {e}")

        def line_iter():
            for fp in readable:
                with open(fp, "rb", buffering=64 * 1024) as f:
                    for raw in f:
                        try:
                            # invalid UTF-8 lines are skipped (reference
                            # read_line error path, src/pipeline.rs:193-218)
                            line = raw.decode("utf-8")
                        except UnicodeDecodeError:
                            continue
                        line = line.rstrip("\n").rstrip("\r")
                        if line:
                            yield line

        data = _build_dispatch(
            list(line_iter()), columns, hyperedge_trim_n, num_workers
        )
        return SparseMatrix._from_graph_data(data)

    # ------------------------------------------------------------- inspection
    @property
    def data(self) -> GraphData:
        if self._data is None:
            raise RuntimeError("Empty SparseMatrix: build via from_iterator/from_files")
        return self._data

    @property
    def descriptor(self) -> RelationDescriptor:
        return self.data.descriptor

    @property
    def entity_ids(self) -> List[str]:
        return self.data.entity_ids

    @entity_ids.setter
    def entity_ids(self, value: List[str]):
        self.data.entity_ids = list(value)
        self._device_cache.pop("index_map", None)

    @property
    def _index_map(self):
        """Lazy entity→index dict (the reference scans the list per lookup)."""
        m = self._device_cache.get("index_map")
        if m is None:
            m = {eid: i for i, eid in enumerate(self.data.entity_ids)}
            self._device_cache["index_map"] = m
        return m

    @property
    def entity_degrees(self) -> np.ndarray:
        return self.data.row_sums.copy()

    @property
    def num_entities(self) -> int:
        return self.data.num_entities

    @property
    def num_edges(self) -> int:
        return self.data.num_edges

    def get_entity_index(self, entity_id: str) -> int:
        idx = self._index_map.get(entity_id)
        if idx is None:
            raise ValueError(f"Entity '{entity_id}' not found")
        return idx

    def get_entity_indices(self, entity_ids: Sequence[str]) -> List[int]:
        index_map = self._index_map
        out = []
        for eid in entity_ids:
            if eid not in index_map:
                raise ValueError(f"Entity '{eid}' not found")
            out.append(index_map[eid])
        return out

    def get_entity_column_mask(self, column_name: str) -> np.ndarray:
        d = self.descriptor
        column_id_by_name = {d.col_a_name: d.col_a_id, d.col_b_name: d.col_b_id}
        if column_name not in column_id_by_name:
            raise ValueError(
                f"Column name '{column_name}' not found. "
                f"Available: '{d.col_a_name}', '{d.col_b_name}'"
            )
        cid = column_id_by_name[column_name]
        return self.data.column_ids == np.uint8(cid)

    def get_neighbors(self, entity_id: str) -> List[Tuple[str, float]]:
        idx = self.get_entity_index(entity_id)
        data = self.data
        start, end = int(data.indptr[idx]), int(data.indptr[idx + 1])
        return [
            (data.entity_ids[int(data.indices[j])], float(data.left_vals[j]))
            for j in range(start, end)
        ]

    def to_sparse_csr(self, markov_type: Optional[str] = None):
        mt = markov_type if markov_type is not None else "left"
        if mt not in ("left", "symmetric"):
            raise ValueError(f"Unknown markov_type '{mt}'. Use 'left' or 'symmetric'.")
        data = self.data
        n = data.num_entities
        nnz = data.num_edges
        rows = np.repeat(
            np.arange(n, dtype=np.uint32), np.diff(data.indptr).astype(np.int64)
        )
        cols = data.indices.astype(np.uint32)
        vals = (data.sym_vals if mt == "symmetric" else data.left_vals).copy()
        return rows, cols, vals, n, n

    # ------------------------------------------------------------ device COO
    def _device_coo(self, markov_type: str, banded_dim: int = 0,
                    canonical: bool = False):
        """Row-sorted padded COO on device, cached per markov type.

        With ``banded_dim`` > 0 (the embedding width about to be propagated),
        large graphs come back in the sliced-ELL layout of
        ``ops.spmm_ell.plan_ell`` (dense-output fixed-width rows — no HBM
        intermediate; 88.3 M edge-ops/s on v5e vs 49.2 M row-banded at the
        bench shape).  Falls back to the row-banded / equal-edge-cut COO
        layouts when ELL padding would exceed its waste bound, and to the
        flat 1-D layout below the chunk threshold.

        ``canonical=True`` requests the compile-cache-portable ELL plan
        (graph-independent slab shapes — ops/spmm_ell.py:_plan_ell_canonical)
        and drops the small-graph chunk-threshold gate so even small graphs
        share one program per scale bucket.
        """
        dim_bucket = 1 << max(banded_dim - 1, 0).bit_length() if banded_dim else 0
        key = ("coo", markov_type, dim_bucket, canonical)
        if key not in self._device_cache:
            jax, jnp = _require_jax()
            from .ops.spmm import (
                EdgeCutBands,
                pad_coo,
                plan_banded_coo,
                plan_edgecut_coo,
            )
            from .ops.spmm_ell import plan_ell

            data = self.data
            n = data.num_entities
            rows = np.repeat(
                np.arange(n, dtype=np.int32), np.diff(data.indptr).astype(np.int64)
            )
            vals = data.sym_vals if markov_type == "symmetric" else data.left_vals
            triple = None
            if dim_bucket:
                nnz = rows.shape[0]
                from .ops.spmm import _chunk_edges_for

                if canonical or nnz > _chunk_edges_for(n, dim_bucket):
                    plan = plan_ell(rows, data.indices, vals, n,
                                    d=dim_bucket, canonical=canonical)
                    if plan is not None:
                        triple = (plan, (), ())
                if triple is None:
                    triple = plan_banded_coo(
                        rows, data.indices, vals, n, d=dim_bucket
                    )
                if triple is None:
                    # banding declined (degree skew) — the equal-edge-cut
                    # layout handles hubs by splitting rows across bands
                    triple = plan_edgecut_coo(
                        rows, data.indices, vals, n, d=dim_bucket
                    )
            if triple is None:
                if dim_bucket:
                    # banding declined — alias this (markov, dim) key to the
                    # 1-D entry so repeat calls skip the O(nnz) re-planning
                    self._device_cache[key] = self._device_coo(markov_type)
                    return self._device_cache[key]
                triple = pad_coo(rows, data.indices, vals, n)

            from .ops.spmm_ell import EllPlan

            def _dev(a):  # ELL placeholder cols/vals leaves are empty tuples
                if isinstance(a, (EdgeCutBands, EllPlan)):
                    return a.device()
                if isinstance(a, tuple):
                    return tuple(jnp.asarray(x) for x in a)
                return jnp.asarray(a)

            self._device_cache[key] = tuple(_dev(a) for a in triple)
        return self._device_cache[key]

    # ------------------------------------------------------------- compute API
    def _propagate(self, x, markov_type: str, num_workers=None) -> np.ndarray:
        x = np.asarray(x, dtype=np.float32)
        if x.shape[0] != self.num_entities:
            raise ValueError(
                f"Embedding matrix has {x.shape[0]} rows but graph has "
                f"{self.num_entities} entities"
            )
        jax, jnp = _require_jax()
        from .ops.spmm import spmm

        rows, cols, vals = self._device_coo(markov_type)
        out = spmm(rows, cols, vals, jnp.asarray(x), self.num_entities)
        return to_host(out)

    def left_markov_propagate(self, x, num_workers: Optional[int] = None) -> np.ndarray:
        return self._propagate(x, "left", num_workers)

    def symmetric_markov_propagate(
        self, x, num_workers: Optional[int] = None
    ) -> np.ndarray:
        return self._propagate(x, "symmetric", num_workers)

    def initialize_deterministically(self, feature_dim: int, seed: int = 0) -> np.ndarray:
        """Bit-exact parity with the reference hash init (src/lib.rs:242-252,478-488)."""
        return init_embeddings(self.data.entity_hashes, feature_dim, seed)

    def l2_normalize(self, x, num_workers: Optional[int] = None) -> np.ndarray:
        x = np.asarray(x, dtype=np.float32)
        norms = np.sqrt((x * x).sum(axis=1, keepdims=True))
        return x / np.maximum(norms, 1e-10)

    def _markov_name(self, propagation: str) -> str:
        if propagation not in ("left", "symmetric"):
            raise ValueError(
                f"Unknown propagation '{propagation}'. Use 'left' or 'symmetric'."
            )
        return propagation

    def embed_fast(
        self,
        feature_dim: int,
        num_iterations: int,
        propagation: str = "left",
        seed: int = 0,
        residual_weight: float = 0.0,
        num_workers: Optional[int] = None,
    ) -> np.ndarray:
        """Fused on-device loop: one dispatch for all iterations."""
        mt = self._markov_name(propagation)
        jax, jnp = _require_jax()
        from .ops.loop import effective_residual_weight, embed_loop

        # embed_fast mirrors the Rust fast path: w outside (0,1) is ignored
        residual_weight = effective_residual_weight(residual_weight, True)
        from .ops.memory import check_device_fit

        check_device_fit(self.num_entities, int(feature_dim),
                         int(self.data.indices.shape[0]))
        x0 = jnp.asarray(self.initialize_deterministically(feature_dim, seed))
        rows, cols, vals = self._device_coo(mt, banded_dim=int(feature_dim))
        out = embed_loop(
            rows, cols, vals, x0,
            n_rows=self.num_entities,
            num_iterations=int(num_iterations),
            residual_weight=float(residual_weight),
            normalization="l2",
            do_whiten=False,
        )
        return to_host(out)

    def embed_fast_convergence(
        self,
        feature_dim: int,
        max_iterations: int,
        propagation: str = "left",
        seed: int = 0,
        residual_weight: float = 0.0,
        convergence_threshold: float = 0.0,
        num_workers: Optional[int] = None,
    ) -> Tuple[np.ndarray, int]:
        mt = self._markov_name(propagation)
        jax, jnp = _require_jax()
        from .ops.loop import effective_residual_weight, embed_loop_convergence

        residual_weight = effective_residual_weight(residual_weight, True)
        from .ops.memory import check_device_fit

        check_device_fit(self.num_entities, int(feature_dim),
                         int(self.data.indices.shape[0]))
        x0 = jnp.asarray(self.initialize_deterministically(feature_dim, seed))
        rows, cols, vals = self._device_coo(mt, banded_dim=int(feature_dim))
        out, iters = embed_loop_convergence(
            rows, cols, vals, x0,
            n_rows=self.num_entities,
            max_iterations=int(max_iterations),
            residual_weight=float(residual_weight),
            convergence_threshold=float(convergence_threshold),
            normalization="l2",
            do_whiten=False,
        )
        return to_host(out), int(iters)

    # ---------------------------------------------------------------- dunders
    def __repr__(self) -> str:
        d = self.descriptor
        return (
            f"SparseMatrix(entities={self.num_entities}, edges={self.num_edges}, "
            f"columns=('{d.col_a_name}', '{d.col_b_name}'))"
        )

    def __len__(self) -> int:
        return self.num_entities

    def __getstate__(self):
        data = self.data
        return pickle.dumps(
            {
                "descriptor": (
                    data.descriptor.col_a_id,
                    data.descriptor.col_a_name,
                    data.descriptor.col_b_id,
                    data.descriptor.col_b_name,
                ),
                "entity_ids": data.entity_ids,
                "entity_hashes": data.entity_hashes,
                "column_ids": data.column_ids,
                "row_sums": data.row_sums,
                "indptr": data.indptr,
                "indices": data.indices,
                "left_vals": data.left_vals,
                "sym_vals": data.sym_vals,
            }
        )

    def __setstate__(self, state):
        d = pickle.loads(state)
        self._data = GraphData(
            descriptor=RelationDescriptor(*d["descriptor"]),
            entity_ids=d["entity_ids"],
            entity_hashes=d["entity_hashes"],
            column_ids=d["column_ids"],
            row_sums=d["row_sums"],
            indptr=d["indptr"],
            indices=d["indices"],
            left_vals=d["left_vals"],
            sym_vals=d["sym_vals"],
        )
        self._device_cache = {}

    def __reduce__(self):
        return (SparseMatrix, (), self.__getstate__())
