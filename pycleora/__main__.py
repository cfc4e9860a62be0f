"""`python -m pycleora` entry point (parity: the reference's
pycleora/__main__.py routes to its cli.main)."""

from cleora_tpu.cli import main

if __name__ == "__main__":
    main()
