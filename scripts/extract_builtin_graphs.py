"""Extract the built-in (hard-coded) public graph datasets from the reference
into a JSON data file.

These are published datasets (Zachary karate club, dolphins, Les Misérables,
college football) — data, not code.  Stored as
cleora_tpu/data/builtin_graphs.json and loaded by cleora_tpu.datasets.

Run once: python scripts/extract_builtin_graphs.py
"""

import importlib.util
import json
import os

REF = "/root/reference/pycleora/datasets.py"
OUT = os.path.join(os.path.dirname(__file__), "..", "cleora_tpu", "data",
                   "builtin_graphs.json")

spec = importlib.util.spec_from_file_location("ref_datasets", REF)
ref = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ref)

out = {}
for name, loader in [
    ("karate_club", ref.load_karate_club),
    ("dolphins", ref.load_dolphins),
    ("les_miserables", ref.load_les_miserables),
    ("football", ref.load_football),
]:
    d = loader()
    out[name] = {
        "name": d["name"],
        "edges": list(d["edges"]),
        "labels": {k: int(v) for k, v in d["labels"].items()},
        "num_nodes": int(d["num_nodes"]),
        "num_edges": int(d["num_edges"]),
        "num_classes": int(d["num_classes"]),
        "columns": d["columns"],
        "description": d["description"],
    }

os.makedirs(os.path.dirname(os.path.abspath(OUT)), exist_ok=True)
with open(OUT, "w") as f:
    json.dump(out, f, indent=1)
print(f"wrote {OUT}: " + ", ".join(f"{k} ({len(v['edges'])}e)" for k, v in out.items()))
