"""On-chip A/B of the partition-compacted counting reduce (ROADMAP 4b).

Times ``device_pair_counts`` (the multi-pass sort-bound counting stage of
the device walk pipeline, ops/cooccur.py) over one fixed synthetic walk
corpus, with the exact full-batch sort path vs the gated
``CLEORA_COOC_COMPACT=1`` path that scatters each pass's live lanes
(~1/passes of the batch) into a power-of-two-ish bucket before the
lexicographic sort.  The two paths are bit-identical by unit test
(tests/test_cooccur_device.py::test_compact*); this probe measures the
WALL difference on the real chip, which is the one thing the CPU mesh
cannot tell us (the repo does not default unmeasured perf paths).

Protocol: each leg runs the full pass sweep twice and reports the second
(warm) run — merge shapes depend on per-pass unique counts, which are
identical across legs, so the merge executables are shared and only the
reduce program differs.  Equality is checked per pass via the unique
count m plus a device-side checksum (scalars only across the tunnel).

Usage:  python scripts/compact_ab_probe.py [--rows 65536] [--batches 2]
            [--passes 8] [--length 80] [--window 10] [--nodes 50000]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=65536)
    ap.add_argument("--batches", type=int, default=2)
    ap.add_argument("--passes", type=int, default=8)
    ap.add_argument("--length", type=int, default=80)
    ap.add_argument("--window", type=int, default=10)
    ap.add_argument("--nodes", type=int, default=50000)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--reps", type=int, default=2,
                    help="runs per leg; last one is the reported time")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from cleora_tpu.ops import cooccur

    rng = np.random.RandomState(args.seed)
    host = [
        rng.randint(0, args.nodes, size=(args.rows, args.length),
                    dtype=np.int32)
        for _ in range(args.batches)
    ]
    dev = [(jax.device_put(w), 0) for w in host]
    jax.block_until_ready([w for w, _ in dev])
    w = min(args.window, args.length - 1)
    lanes = 2 * args.rows * (w * args.length - w * (w + 1) // 2)
    total = lanes * args.batches * args.passes
    print(f"corpus: {args.batches} x ({args.rows},{args.length}) over "
          f"n={args.nodes}; {lanes:,} lanes/batch, "
          f"{total:,} lane-sorts/leg (full path)")

    def batches_fn():
        return iter(dev)

    @jax.jit
    def _checksum(cen, ctx, cnt, m):
        # wrapping int32 sum over the m real slots (masked, fixed shape:
        # one compile per bucket size, not per distinct m) — tail slots
        # and bucket-size differences between the paths don't leak in
        live = jnp.arange(cen.shape[0], dtype=jnp.int32) < m
        term = cnt * ((cen % 9973) + 1) * ((ctx % 9931) + 1)
        return jnp.sum(jnp.where(live, term, 0))

    def summarize(ranges):
        return [(int(m), int(_checksum(cen, ctx, cnt, jnp.int32(m))))
                for cen, ctx, cnt, m in ranges]

    _KEYS = ("CLEORA_COOC_COMPACT", "CLEORA_COOC_SWEEP")

    def leg(name, env):
        old = {k: os.environ.pop(k, None) for k in _KEYS}
        os.environ.update(env)
        try:
            walls, sums = [], None
            for rep in range(args.reps):
                t0 = time.time()
                ranges, m_total = cooccur.device_pair_counts(
                    batches_fn, args.nodes, args.window,
                    passes=args.passes)
                sums = summarize(ranges)  # scalar fetches force completion
                walls.append(time.time() - t0)
                del ranges
                print(f"  {name} rep{rep}: {walls[-1]:.1f}s "
                      f"(m_total={m_total:,})", flush=True)
            return walls[-1], sums
        finally:
            for k, v in old.items():
                if v is not None:
                    os.environ[k] = v
                else:
                    os.environ.pop(k, None)

    print("leg FULL (exact per-pass full-batch sorts):", flush=True)
    t_full, s_full = leg("full", {"CLEORA_COOC_SWEEP": "0"})
    print("leg COMPACT (CLEORA_COOC_COMPACT=1):", flush=True)
    t_comp, s_comp = leg("compact", {"CLEORA_COOC_SWEEP": "0",
                                     "CLEORA_COOC_COMPACT": "1"})
    print("leg SWEEP (single-sweep all-partitions reduce):", flush=True)
    t_swp, s_swp = leg("sweep", {})

    ok = s_full == s_comp == s_swp
    print(f"equal per-pass (m, checksum): {ok}")
    if not ok:
        for i, (a, b, c) in enumerate(zip(s_full, s_comp, s_swp)):
            if not (a == b == c):
                print(f"  pass {i}: full={a} compact={b} sweep={c}")
    rate_f = total / t_full / 1e6
    print(f"full:    {t_full:.1f}s warm  ({rate_f:.1f} M lane-sorts/s)")
    print(f"compact: {t_comp:.1f}s warm  -> {t_full / t_comp:.2f}x")
    print(f"sweep:   {t_swp:.1f}s warm  -> {t_full / t_swp:.2f}x")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
