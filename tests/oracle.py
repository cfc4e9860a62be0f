"""Slow, literal re-implementation of the reference build loop for testing.

Mirrors SparseMatrixBuffer/BuffersReducer semantics
(/root/reference/src/sparse_matrix_builder.rs) one hyperedge at a time with
plain dicts — the numeric oracle the vectorized/native builders are checked
against.
"""

from __future__ import annotations

import numpy as np

from cleora_tpu.graph.columns import create_relation_descriptor, parse_fields, parse_line
from cleora_tpu.graph.hashing import hash_entity


def oracle_build(lines, columns, hyperedge_trim_n=16):
    cols = parse_fields(columns)
    create_relation_descriptor(cols)
    reflexive = len(cols) == 1

    key_2_index = {}
    entity_ids = []
    column_ids = []

    def register(tok, col_id):
        h = hash_entity(tok)
        if h not in key_2_index:
            key_2_index[h] = len(key_2_index)
            entity_ids.append(tok)
            column_ids.append(col_id)
        return h

    occurrence = {}
    row_sum = {}
    edges = {}

    def update_row(h, count):
        occurrence[h] = occurrence.get(h, 0) + count
        row_sum[h] = np.float32(row_sum.get(h, np.float32(0.0)) + np.float32(1.0 / count))

    def get_high_low(nodes_list):
        if len(nodes_list) > hyperedge_trim_n:
            arr = sorted(
                range(len(nodes_list)),
                key=lambda i: (-occurrence.get(nodes_list[i], 0), i),
            )
            high = [nodes_list[i] for i in arr[:hyperedge_trim_n]]
            low = [nodes_list[i] for i in arr[hyperedge_trim_n:]]
            return high, low
        return list(nodes_list), []

    for line in lines:
        row = parse_line(line)
        if len(row) != len(cols):
            continue
        if reflexive:
            toks = row[0]
            hashes_a = [register(t, 0) for t in toks]
            hashes_b = hashes_a
        else:
            ta = row[0] if cols[0].complex else row[0][:1]
            tb = row[1] if cols[1].complex else row[1][:1]
            hashes_a = [register(t, 0) for t in ta]
            hashes_b = [register(t, 1) for t in tb]

        total = len(hashes_a) * len(hashes_b)
        for h in hashes_a:
            update_row(h, len(hashes_b))
        for h in hashes_b:
            update_row(h, len(hashes_a))
        value = np.float32(1.0 / total)

        a_hi, a_lo = get_high_low(hashes_a)
        b_hi, b_lo = get_high_low(hashes_b)
        for pa, pb in ((a_hi, b_hi), (a_hi, b_lo), (a_lo, b_hi)):
            for a in pa:
                for b in pb:
                    edges[(a, b)] = np.float32(edges.get((a, b), np.float32(0.0)) + value)
                    edges[(b, a)] = np.float32(edges.get((b, a), np.float32(0.0)) + value)

    n = len(entity_ids)
    entries = []
    for (a, b), v in edges.items():
        entries.append((key_2_index[a], key_2_index[b], v))
    entries.sort(key=lambda t: (t[0], t[1]))

    row_sums = np.zeros(n, dtype=np.float32)
    for h, idx in key_2_index.items():
        row_sums[idx] = row_sum.get(h, np.float32(0.0))

    rows = np.array([e[0] for e in entries], dtype=np.int64)
    colsx = np.array([e[1] for e in entries], dtype=np.int32)
    raw = np.array([e[2] for e in entries], dtype=np.float32)
    left = raw / row_sums[rows]
    sym = raw / np.sqrt(row_sums[rows] * row_sums[colsx.astype(np.int64)])

    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, rows + 1, 1)
    np.cumsum(indptr, out=indptr)

    return {
        "entity_ids": entity_ids,
        "column_ids": np.array(column_ids, dtype=np.uint8),
        "row_sums": row_sums,
        "indptr": indptr,
        "indices": colsx,
        "left_vals": left.astype(np.float32),
        "sym_vals": sym.astype(np.float32),
    }
