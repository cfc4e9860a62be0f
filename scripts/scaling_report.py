"""Thin wrapper around cleora_tpu.scaling (kept for the documented
command lines; the measurement/gate logic moved into the package so the
CLI's ``cleora-tpu scaling`` subcommand shares it).

    # validate the harness + collective structure on the virtual CPU mesh
    PYTHONPATH=. XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_report.py --cpu --smoke --check 0.0

    # on a pod slice: real edges/s, hard >=80% efficiency gate
    python scripts/scaling_report.py --check            # exit 2 on FAIL

Flags:
    --cpu           force the CPU backend (virtual mesh)
    --smoke         tiny shapes / few iters — structural validation only
    --check [X]     assert efficiency at the largest device count >= X
                    (default 0.80, the BASELINE.json target); exit 2 on FAIL
    --json PATH     write the full measurement table as JSON
"""

import sys

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

from cleora_tpu.scaling import TARGET_EFFICIENCY, run_report  # noqa: E402


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    smoke = "--smoke" in argv
    if smoke:
        argv.remove("--smoke")
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        del argv[i:i + 2]
    check = None
    if "--check" in argv:
        i = argv.index("--check")
        nxt = argv[i + 1] if i + 1 < len(argv) else None
        if nxt is not None and not nxt.startswith("-"):
            check = float(nxt)
            del argv[i:i + 2]
        else:
            check = TARGET_EFFICIENCY
            del argv[i]

    return run_report(smoke=smoke, check=check, json_path=json_path)


if __name__ == "__main__":
    sys.exit(main())
