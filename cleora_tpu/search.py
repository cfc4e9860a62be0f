"""Approximate nearest-neighbor search (reference: /root/reference/pycleora/search.py).

``ANNIndex`` prefers hnswlib when installed (cosine, M=16, ef_construction=200,
ef=50), else falls back to a cosine ball tree, else brute force.  Query results
are [{entity_id, index, similarity}] sorted by similarity.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def _unit(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v)
    return v / n if n > 1e-10 else v


class _BallTree:
    """Cosine-similarity ball tree with branch-and-bound pruning
    (reference search.py:5-99); leaf size 32."""

    _LEAF = 32

    def __init__(self, data: np.ndarray):
        self._normalized = data / np.maximum(
            np.linalg.norm(data, axis=1, keepdims=True), 1e-10
        )
        self._tree = self._build(np.arange(data.shape[0]))

    def _build(self, indices: np.ndarray):
        if len(indices) <= self._LEAF:
            return {"indices": indices, "leaf": True}
        points = self._normalized[indices]
        center = _unit(points.mean(axis=0))
        radius = float(np.max(np.linalg.norm(points - center, axis=1)))

        axis = int(np.argmax(np.var(points, axis=0)))
        left_mask = points[:, axis] <= np.median(points[:, axis])
        if left_mask.all() or not left_mask.any():
            left_mask[:] = False
            left_mask[: len(indices) // 2] = True
        return {
            "leaf": False,
            "center": center,
            "radius": radius,
            "left": self._build(indices[left_mask]),
            "right": self._build(indices[~left_mask]),
        }

    def query(self, query_vec: np.ndarray, top_k: int):
        q = _unit(query_vec)
        candidates: List = []
        self._search(self._tree, q, top_k, candidates)
        candidates.sort(key=lambda x: -x[1])
        candidates = candidates[:top_k]
        return (
            np.array([c[0] for c in candidates], dtype=np.int64),
            np.array([c[1] for c in candidates], dtype=np.float64),
        )

    def _search(self, node, q, top_k, candidates):
        if node["leaf"]:
            sims = self._normalized[node["indices"]] @ q
            for idx, sim in zip(node["indices"], sims):
                self._insert(candidates, int(idx), float(sim), top_k)
            return
        worst = candidates[-1][1] if len(candidates) >= top_k else -2.0
        if len(candidates) >= top_k and np.dot(node["center"], q) + node["radius"] < worst:
            return
        left, right = node["left"], node["right"]
        lc, rc = left.get("center"), right.get("center")
        if lc is not None and rc is not None and np.dot(lc, q) < np.dot(rc, q):
            left, right = right, left
        self._search(left, q, top_k, candidates)
        self._search(right, q, top_k, candidates)

    @staticmethod
    def _insert(candidates, idx, sim, top_k):
        if len(candidates) < top_k:
            candidates.append((idx, sim))
            if len(candidates) == top_k:
                candidates.sort(key=lambda x: -x[1])
        elif sim > candidates[-1][1]:
            candidates[-1] = (idx, sim)
            candidates.sort(key=lambda x: -x[1])


class ANNIndex:
    """hnswlib → ball tree → brute-force cosine index
    (reference search.py:101-210)."""

    def __init__(self, graph, embeddings: np.ndarray, method: str = "hnsw"):
        if method not in ("hnsw", "brute", "device"):
            raise ValueError(
                f"Unknown method: '{method}'. Use 'hnsw', 'brute', or 'device'."
            )
        self._graph = graph
        self._embeddings = embeddings
        self._method = method
        self._n, self._dim = embeddings.shape
        self._normalized = embeddings / np.maximum(
            np.linalg.norm(embeddings, axis=1, keepdims=True), 1e-10
        )
        self._hnsw_index = None
        self._ball_tree = None
        self._device_table = None
        if method == "device":
            # exact cosine top-k on the accelerator: one matmul + lax.top_k;
            # at 1 GB/s-scale tables this outruns host ANN construction
            import jax
            import jax.numpy as jnp

            self._device_table = jnp.asarray(self._normalized)

            def _topk(q, k):
                sims = self._device_table @ q
                return jax.lax.top_k(sims, k)

            self._device_topk = jax.jit(_topk, static_argnums=1)
        if method == "hnsw":
            try:
                import hnswlib

                self._hnsw_index = hnswlib.Index(space="cosine", dim=self._dim)
                self._hnsw_index.init_index(
                    max_elements=self._n, ef_construction=200, M=16
                )
                self._hnsw_index.add_items(self._normalized, np.arange(self._n))
                self._hnsw_index.set_ef(50)
            except ImportError:
                self._ball_tree = _BallTree(self._embeddings)

    def query(self, entity_id: str, top_k: int = 10,
              exclude_self: bool = True) -> List[Dict]:
        if top_k <= 0:
            raise ValueError(f"top_k must be positive, got {top_k}")
        idx = self._graph.get_entity_index(entity_id)
        fetch_k = top_k + 1 if exclude_self else top_k
        results = self._query_internal(self._embeddings[idx], fetch_k)
        if exclude_self:
            results = [r for r in results if r["entity_id"] != entity_id]
        return results[:top_k]

    def query_vector(self, vector: np.ndarray, top_k: int = 10) -> List[Dict]:
        if top_k <= 0:
            raise ValueError(f"top_k must be positive, got {top_k}")
        return self._query_internal(vector, top_k)

    def query_batch(self, vectors: np.ndarray, top_k: int = 10) -> List[List[Dict]]:
        """Top-k for a (Q, dim) block of query vectors at once (serving path).

        The "device" method runs one (Q, D)·(D, N) MXU matmul + top_k in a
        single XLA dispatch; "brute" is vectorized numpy; "hnsw" uses the
        library's native batch knn.  Returns one result list per query row.
        """
        if top_k <= 0:
            raise ValueError(f"top_k must be positive, got {top_k}")
        vectors = np.asarray(vectors, dtype=np.float32)
        if vectors.ndim != 2 or vectors.shape[1] != self._dim:
            raise ValueError(
                f"vectors must have shape (Q, {self._dim}), got {vectors.shape}"
            )
        k = min(top_k, self._n)
        qn = vectors / np.maximum(
            np.linalg.norm(vectors, axis=1, keepdims=True), 1e-10
        )
        if self._method == "device":
            import jax
            import jax.numpy as jnp

            if getattr(self, "_device_topk_batch", None) is None:
                def _topk_batch(q, kk):
                    sims = jnp.dot(
                        q, self._device_table.T,
                        preferred_element_type=jnp.float32,
                    )
                    return jax.lax.top_k(sims, kk)

                self._device_topk_batch = jax.jit(_topk_batch, static_argnums=1)
            sims, idx = self._device_topk_batch(
                jnp.asarray(qn, dtype=self._device_table.dtype), k
            )
            sims, idx = np.asarray(sims), np.asarray(idx)
            return [self._results(idx[i], sims[i]) for i in range(len(qn))]
        if self._method == "brute":
            sims = qn @ self._normalized.T  # (Q, N)
            top = np.argpartition(sims, -k, axis=1)[:, -k:]
            rs = np.take_along_axis(sims, top, axis=1)
            order = np.argsort(rs, axis=1)[:, ::-1]
            top = np.take_along_axis(top, order, axis=1)
            rs = np.take_along_axis(rs, order, axis=1)
            return [self._results(top[i], rs[i]) for i in range(len(qn))]
        if self._hnsw_index is not None:
            if k > 50:  # hnswlib raises when k > ef (pinned at 50 on build)
                self._hnsw_index.set_ef(k)
            labels, distances = self._hnsw_index.knn_query(qn, k=k)
            return [
                self._results(labels[i], 1.0 - distances[i])
                for i in range(len(qn))
            ]
        return [
            self._results(*self._ball_tree.query(v, k)) for v in vectors
        ]

    def _query_internal(self, query_vec: np.ndarray, top_k: int) -> List[Dict]:
        k = min(top_k, self._n)
        if self._method == "device":
            import jax.numpy as jnp

            sims, idx = self._device_topk(
                jnp.asarray(_unit(query_vec), dtype=self._device_table.dtype), k
            )
            return self._results(np.asarray(idx), np.asarray(sims))
        if self._method == "brute":
            sims = self._normalized @ _unit(query_vec)
            top = np.argpartition(sims, -k)[-k:]
            top = top[np.argsort(sims[top])[::-1]]
            return self._results(top, sims[top])
        if self._hnsw_index is not None:
            if k > 50:  # hnswlib raises when k > ef (pinned at 50 on build)
                self._hnsw_index.set_ef(k)
            labels, distances = self._hnsw_index.knn_query(
                _unit(query_vec).reshape(1, -1), k=k
            )
            return self._results(labels[0], 1.0 - distances[0])
        indices, sims = self._ball_tree.query(query_vec, k)
        return self._results(indices, sims)

    def _results(self, indices, sims) -> List[Dict]:
        ids = self._graph.entity_ids
        return [
            {"entity_id": ids[int(i)], "index": int(i), "similarity": float(s)}
            for i, s in zip(indices, sims)
        ]


class ShardedDeviceIndex:
    """Exact cosine top-k over a row-sharded, device-RESIDENT table — the
    serving path for embedding tables beyond one chip's HBM.

    The L2-normalized (N, D) table is placed ONCE across the mesh (row
    shards; optionally bfloat16 for double capacity) and stays resident:
    each query batch is one jitted dispatch — per-shard (Q, D)·(D, N/P) MXU
    matmul + local top-k, an all_gather of the P·k candidates (k·P ≪ N
    rides ICI), and a replicated final top-k.  No part of the table ever
    returns to the host.  TPU-native extension of the reference's serving
    story (/root/reference/pycleora/search.py keeps the table in host RAM
    and rebuilds hnsw on every process start).
    """

    def __init__(self, graph, embeddings: np.ndarray, mesh=None,
                 dtype: str = "float32"):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec

        from .parallel.mesh import make_mesh, round_up, shard_axes

        if dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"Unknown dtype '{dtype}'. Use 'float32' or 'bfloat16'."
            )
        self._graph = graph
        self._mesh = mesh if mesh is not None else make_mesh()
        self._axis = shard_axes(self._mesh)
        n_shards = int(self._mesh.devices.size)
        emb = np.asarray(embeddings)
        self._n, self._dim = emb.shape
        # row norms once (N floats); the table itself is normalized, cast
        # and padded PER SHARD SLICE inside the placement callback — peak
        # extra host memory is one shard's slice, not 3-4 full-table copies
        # (the class exists for tables beyond one chip's HBM)
        norms = np.maximum(
            np.sqrt(np.einsum("ij,ij->i", emb, emb,
                              dtype=np.float32)), 1e-10
        ).astype(np.float32)[:, None]
        n_padded = round_up(max(self._n, n_shards), n_shards)
        self._n_padded = n_padded
        tdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        row_spec = PartitionSpec(self._axis, None)
        n_real, dim = self._n, self._dim

        def _shard_data(index):
            rs = index[0]
            lo = 0 if rs.start is None else rs.start
            hi = n_padded if rs.stop is None else rs.stop
            block = np.zeros((hi - lo, dim), dtype=tdtype)
            real = max(0, min(hi, n_real) - lo)
            if real:
                block[:real] = (emb[lo:lo + real].astype(np.float32)
                                / norms[lo:lo + real]).astype(tdtype)
            return block

        self._table = jax.make_array_from_callback(
            (n_padded, self._dim), NamedSharding(self._mesh, row_spec),
            _shard_data,
        )
        rows_per_shard = n_padded // n_shards
        axis = self._axis

        def _local_topk(table, q, k):
            import jax.lax as lax

            sims = jnp.dot(q, table.T, preferred_element_type=jnp.float32)
            # axis_index flattens tuple axes (hierarchical mesh) itself
            base = lax.axis_index(axis) * rows_per_shard
            # mask padded rows (zero vectors would outrank negative cosines)
            local_rows = base + jnp.arange(rows_per_shard)
            sims = jnp.where(local_rows[None, :] < n_real, sims, -jnp.inf)
            # a shard can hold fewer than k rows; the P·k_local gathered
            # candidates still cover the global top-k (k ≤ n ≤ P·rows/shard)
            kl = min(k, rows_per_shard)
            s, i = lax.top_k(sims, kl)  # (Q, k_local) local
            s_all = lax.all_gather(s, axis)  # (P, Q, k_local)
            i_all = lax.all_gather(i + base, axis)
            q_n = s.shape[0]
            s_flat = jnp.moveaxis(s_all.reshape(-1, q_n, kl), 0, 1)
            i_flat = jnp.moveaxis(i_all.reshape(-1, q_n, kl), 0, 1)
            gs, gi = lax.top_k(s_flat.reshape(q_n, -1), k)
            return gs, jnp.take_along_axis(
                i_flat.reshape(q_n, -1), gi, axis=1
            )

        def _query(table, q, k):
            from jax.sharding import PartitionSpec as P

            fn = jax.shard_map(
                lambda t, qq: _local_topk(t, qq, k),
                mesh=self._mesh,
                in_specs=(row_spec, P(*((None,) * 2))),
                out_specs=(P(None, None), P(None, None)),
                # outputs ARE replicated (they follow an all_gather) but the
                # static varying-axes check can't prove it past the top_k
                check_vma=False,
            )
            return fn(table, q)

        self._jitted = jax.jit(_query, static_argnums=2)

    def query_batch(self, vectors: np.ndarray,
                    top_k: int = 10) -> List[List[Dict]]:
        """Global top-k for a (Q, dim) block in one sharded dispatch."""
        import jax.numpy as jnp

        if top_k <= 0:
            raise ValueError(f"top_k must be positive, got {top_k}")
        vectors = np.asarray(vectors, dtype=np.float32)
        if vectors.ndim != 2 or vectors.shape[1] != self._dim:
            raise ValueError(
                f"vectors must have shape (Q, {self._dim}), got {vectors.shape}"
            )
        k = min(top_k, self._n)
        qn = vectors / np.maximum(
            np.linalg.norm(vectors, axis=1, keepdims=True), 1e-10
        )
        sims, idx = self._jitted(
            self._table, jnp.asarray(qn, dtype=self._table.dtype), k
        )
        sims, idx = np.asarray(sims), np.asarray(idx)
        return [self._results(idx[i], sims[i]) for i in range(len(qn))]

    def query_vector(self, vector: np.ndarray, top_k: int = 10) -> List[Dict]:
        return self.query_batch(
            np.asarray(vector, dtype=np.float32).reshape(1, -1), top_k
        )[0]

    def query(self, entity_id: str, top_k: int = 10,
              exclude_self: bool = True) -> List[Dict]:
        if top_k <= 0:
            raise ValueError(f"top_k must be positive, got {top_k}")
        idx = self._graph.get_entity_index(entity_id)
        fetch_k = top_k + 1 if exclude_self else top_k
        table_row = np.asarray(self._row(idx), dtype=np.float32)
        results = self.query_batch(table_row.reshape(1, -1), fetch_k)[0]
        if exclude_self:
            results = [r for r in results if r["entity_id"] != entity_id]
        return results[:top_k]

    def _row(self, idx: int):
        """One table row, gathered on device into a REPLICATED output so the
        host fetch is addressable in every process (direct indexing of the
        row-sharded table would raise for rows owned by a remote host)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec

        if getattr(self, "_row_fn", None) is None:
            self._row_fn = jax.jit(
                lambda t, i: t[i],
                out_shardings=NamedSharding(self._mesh, PartitionSpec()),
            )
        return self._row_fn(self._table, jnp.int32(idx))

    def _results(self, indices, sims) -> List[Dict]:
        ids = self._graph.entity_ids
        return [
            {"entity_id": ids[int(i)], "index": int(i), "similarity": float(s)}
            for i, s in zip(indices, sims)
        ]
