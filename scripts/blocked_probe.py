"""Validate the blocked (beyond-HBM) device NetMF/GraRep on the real TPU
(VERDICT r2 #6 "done when": n=65k runs on the v5e and matches the host
path at sketch tolerance).

Stage "check" (default): n=8,192 synthetic graph — the largest size the
4-vCPU host can factorize densely in f64 — compares blocked-device vs
host embeddings via the Gram cosine structure at sketch tolerance.

Stage "scale": n=65,536 (4x past the ~45k dense-HBM gate, dense form
would need ~103 GiB) — runs blocked NetMF + GraRep on the chip, reports
wall time and sanity stats.

    PYTHONPATH=. python scripts/blocked_probe.py [check|scale]
"""

import sys
import time

import numpy as np


def synth_graph(n, avg_deg, seed):
    from cleora_tpu import SparseMatrix

    rng = np.random.default_rng(seed)
    m = n * avg_deg // 2
    src = rng.integers(0, n, m)
    dst = (src + 1 + rng.integers(0, n // 4, m)) % n  # connected-ish ring
    lines = (f"a{s} a{d}" for s, d in zip(src, dst))
    return SparseMatrix.from_iterator(lines, "complex::reflexive::a")


def gram_cos(a, b):
    ga, gb = a @ a.T, b @ b.T
    num = (ga * gb).sum()
    return num / (np.linalg.norm(ga) * np.linalg.norm(gb))


def stage_check():
    import cleora_tpu.algorithms as alg

    g = synth_graph(8192, 12, 0)
    print(f"check graph: n={g.num_entities}", flush=True)
    t0 = time.time()
    host = alg.embed_netmf(g, feature_dim=64)
    print(f"host netmf: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    dev = alg.embed_netmf(g, feature_dim=64, backend="device",
                          power_iters=4, block_rows=2048)
    print(f"blocked netmf: {time.time()-t0:.1f}s  "
          f"gram_cos={gram_cos(host, dev):.4f}", flush=True)

    t0 = time.time()
    hostg = alg.embed_grarep(g, feature_dim=64, max_step=2)
    print(f"host grarep: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    devg = alg.embed_grarep(g, feature_dim=64, max_step=2, backend="device",
                            power_iters=4, block_rows=2048)
    print(f"blocked grarep: {time.time()-t0:.1f}s  "
          f"gram_cos={gram_cos(hostg, devg):.4f}", flush=True)


def stage_scale():
    import cleora_tpu.algorithms as alg

    g = synth_graph(65536, 16, 1)
    nnz = g.data.indices.shape[0]
    print(f"scale graph: n={g.num_entities} nnz={nnz}", flush=True)
    t0 = time.time()
    out = alg.embed_netmf(g, feature_dim=128, backend="device")
    wall = time.time() - t0
    norms = np.linalg.norm(out, axis=1)
    print(f"blocked netmf n=65536: {wall:.1f}s  finite={np.isfinite(out).all()}"
          f"  shape={out.shape}  row-norm p50={np.median(norms):.3f}",
          flush=True)
    t0 = time.time()
    outg = alg.embed_grarep(g, feature_dim=128, max_step=2, backend="device")
    wall = time.time() - t0
    print(f"blocked grarep n=65536: {wall:.1f}s  "
          f"finite={np.isfinite(outg).all()}  shape={outg.shape}", flush=True)




def stage_isolate():
    """Dense-device vs blocked-device at n=8192, same omega/sketch — isolates
    the blocked driver from sketch-rank truncation (host gram_cos ~0.76 at
    r=74 of n=8192 reflects a flat log-PMI spectrum, not driver error: the
    host path takes the EXACT top-k, any sketch rotates within near-ties)."""
    import cleora_tpu.algorithms as alg

    g = synth_graph(8192, 12, 0)
    t0 = time.time()
    dense = alg.embed_netmf(g, feature_dim=64, backend="device",
                            power_iters=4)
    print(f"dense-device netmf: {time.time()-t0:.1f}s", flush=True)
    blocked = alg.embed_netmf(g, feature_dim=64, backend="device",
                              power_iters=4, block_rows=2048)
    print(f"netmf dense-vs-blocked gram_cos={gram_cos(dense, blocked):.6f}",
          flush=True)
    t0 = time.time()
    dg = alg.embed_grarep(g, feature_dim=64, max_step=2, backend="device",
                          power_iters=4)
    print(f"dense-device grarep: {time.time()-t0:.1f}s", flush=True)
    bg = alg.embed_grarep(g, feature_dim=64, max_step=2, backend="device",
                          power_iters=4, block_rows=2048)
    print(f"grarep dense-vs-blocked gram_cos={gram_cos(dg, bg):.6f}",
          flush=True)


if __name__ == "__main__":
    stage = sys.argv[1] if len(sys.argv) > 1 else "check"
    {"check": stage_check, "scale": stage_scale,
     "isolate": stage_isolate}[stage]()
