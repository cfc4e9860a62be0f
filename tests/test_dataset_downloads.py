"""Download-loader coverage without network egress.

The SNAP/OGB loaders (cleora_tpu/datasets.py:_load_snap/_load_ogb, mirroring
/root/reference/pycleora/datasets.py:86-220) stream .gz/.zip payloads, cache
parsed arrays as .npz, and validate edge-count drift.  These tests serve
fixture payloads through a monkeypatched ``urllib.request.urlopen`` so the
parse / cache / drift / label logic runs for real.
"""

import gzip
import io
import os
import zipfile

import numpy as np
import pytest

import cleora_tpu.datasets as ds


class _FakeResponse:
    """Minimal urlopen(...) context manager serving fixed bytes."""

    def __init__(self, payload: bytes):
        self._buf = io.BytesIO(payload)
        self.headers = {"Content-Length": str(len(payload))}

    def read(self, n=-1):
        return self._buf.read(n)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


@pytest.fixture
def served(monkeypatch, tmp_path):
    """Route _CACHE_DIR to tmp and urlopen to an in-memory URL→bytes map.
    Returns the map; tests fill it.  Any URL not in the map raises."""
    monkeypatch.setattr(ds, "_CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.setattr(ds, "_COMPAT_CACHE_DIR", str(tmp_path / "compat"))
    payloads = {}
    calls = []

    import urllib.request

    def fake_urlopen(req, *a, **kw):
        url = req.full_url if hasattr(req, "full_url") else str(req)
        calls.append(url)
        if url not in payloads:
            raise AssertionError(f"unexpected network fetch: {url}")
        return _FakeResponse(payloads[url])

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    payloads["__calls__"] = calls
    return payloads


def _gz_edges(pairs, header="# comment line\n"):
    text = header + "".join(f"{s}\t{t}\n" for s, t in pairs)
    return gzip.compress(text.encode())


def test_snap_download_parse_cache(served):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    url = "https://snap.example/test.txt.gz"
    served[url] = _gz_edges(pairs)

    out = ds._load_snap("snaptest", url, "SnapTest", "desc",
                        expected_nodes=4, expected_edges=5)
    assert out["num_nodes"] == 4 and out["num_edges"] == 5
    src, dst = out["edges"].arrays()
    assert src.tolist() == [p[0] for p in pairs]
    assert dst.tolist() == [p[1] for p in pairs]
    # edge list renders as "src dst" strings for from_iterator ingest
    assert list(out["edges"])[0] == "0 1"

    # cached as .npz; the .gz is deleted after parsing
    cache = os.path.join(ds._CACHE_DIR, "snaptest.npz")
    assert os.path.exists(cache)
    assert not os.path.exists(os.path.join(ds._CACHE_DIR, "snaptest.txt.gz"))

    # second call: served from cache, no network
    del served[url]
    again = ds._load_snap("snaptest", url, "SnapTest", "desc",
                          expected_nodes=4, expected_edges=5)
    assert again["num_edges"] == 5
    assert served["__calls__"].count(url) == 1


def test_snap_malformed_lines_skipped(served):
    url = "https://snap.example/messy.txt.gz"
    body = "# hdr\n\n0\t1\nnot numbers\n2\n1\t2\nx\ty\n"
    served[url] = gzip.compress(body.encode())
    out = ds._load_snap("messy", url, "Messy", "d",
                        expected_nodes=3, expected_edges=2)
    assert out["num_edges"] == 2


def test_snap_drift_rejects_corrupt_download(served):
    url = "https://snap.example/corrupt.txt.gz"
    served[url] = _gz_edges([(0, 1), (1, 2)])
    with pytest.raises(ValueError, match="drift.*Delete"):
        ds._load_snap("corrupt", url, "Corrupt", "d",
                      expected_nodes=1000, expected_edges=1000)
    # no poisoned .npz cache left behind
    assert not os.path.exists(os.path.join(ds._CACHE_DIR, "corrupt.npz"))


def test_snap_small_drift_notes_but_loads(served, capsys):
    url = "https://snap.example/drifty.txt.gz"
    served[url] = _gz_edges([(i, i + 1) for i in range(95)])
    out = ds._load_snap("drifty", url, "Drifty", "d",
                        expected_nodes=96, expected_edges=100)
    assert out["num_edges"] == 95  # 5% drift: warn, don't fail


def _ogb_zip(edges, labels=None):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        edge_text = "".join(f"{s},{t}\n" for s, t in edges)
        zf.writestr("dataset/raw/edge.csv.gz", gzip.compress(edge_text.encode()))
        if labels is not None:
            lab_text = "".join(f"{v}\n" for v in labels)
            zf.writestr("dataset/raw/node-label.csv.gz",
                        gzip.compress(lab_text.encode()))
    return buf.getvalue()


def test_ogb_zip_edges_and_labels(served):
    url = "https://ogb.example/test.zip"
    edges = [(0, 1), (1, 2), (2, 0), (3, 1)]
    served[url] = _ogb_zip(edges, labels=[4, 7, 4, 1])

    out = ds._load_ogb("ogbtest", "OgbTest", "d", zip_url=url,
                       edge_csv="raw/edge.csv.gz",
                       label_csv="raw/node-label.csv.gz", num_classes=8,
                       expected_nodes=4, expected_edges=4)
    assert out["num_nodes"] == 4 and out["num_edges"] == 4
    assert out["labels"] == {"0": "4", "1": "7", "2": "4", "3": "1"}

    # cache round-trip preserves labels; zip removed
    del served[url]
    again = ds._load_ogb("ogbtest", "OgbTest", "d", zip_url=url,
                         edge_csv="raw/edge.csv.gz",
                         label_csv="raw/node-label.csv.gz", num_classes=8,
                         expected_nodes=4, expected_edges=4)
    assert again["labels"] == out["labels"]
    assert not os.path.exists(os.path.join(ds._CACHE_DIR, "ogbtest.zip"))


def test_ogb_missing_label_member_warns(served):
    url = "https://ogb.example/nolabel.zip"
    served[url] = _ogb_zip([(0, 1), (1, 0)])
    out = ds._load_ogb("nolabel", "NoLabel", "d", zip_url=url,
                       edge_csv="raw/edge.csv.gz",
                       label_csv="raw/node-label.csv.gz", num_classes=2,
                       expected_nodes=2, expected_edges=2)
    assert out["labels"] == {} and out["num_edges"] == 2


def test_registry_snap_dispatch_with_fixture(served):
    """load_dataset('facebook') exercises the real registry entry: serve a
    fixture sized within the 20% drift gate of the published 88,234 edges."""
    rng = np.random.default_rng(0)
    m = 80_000  # within 20% of 88,234
    pairs = np.stack([rng.integers(0, 4039, m), rng.integers(0, 4039, m)], 1)
    # find the registered URL by probing the loader's failure message
    import urllib.request

    url_holder = {}
    real = urllib.request.urlopen

    def capture(req, *a, **kw):
        url_holder["url"] = req.full_url if hasattr(req, "full_url") else req
        return real(req, *a, **kw)

    # first, learn the URL (the fake raises AssertionError with it)
    try:
        ds.load_dataset("facebook")
    except AssertionError as e:
        url_holder["url"] = str(e).split(": ", 1)[1]
    served[url_holder["url"]] = _gz_edges(pairs.tolist())
    out = ds.load_dataset("facebook")
    assert out["num_edges"] == m
    assert out["columns"] == "complex::reflexive::node"


def test_interrupted_download_leaves_no_partial_cache(served, monkeypatch):
    """A payload that dies mid-read must not leave a .txt.gz or .npz."""
    url = "https://snap.example/flaky.txt.gz"

    class _Dying(_FakeResponse):
        def read(self, n=-1):
            raise ConnectionResetError("mid-transfer")

    import urllib.request

    monkeypatch.setattr(urllib.request, "urlopen",
                        lambda req, *a, **kw: _Dying(b""))
    with pytest.raises(ConnectionResetError):
        ds._load_snap("flaky", url, "Flaky", "d",
                      expected_nodes=2, expected_edges=1)
    left = os.listdir(ds._CACHE_DIR)
    assert "flaky.npz" not in left and "flaky.txt.gz" not in left


# ------------------------------------------------- pre-seeded cache (no net)
def _seed_gz(dirpath, name, pairs):
    os.makedirs(dirpath, exist_ok=True)
    path = os.path.join(dirpath, name)
    with open(path, "wb") as f:
        f.write(_gz_edges(pairs))
    return path


def test_preseeded_raw_gz_skips_network_and_survives(served):
    """A manually seeded <name>.txt.gz is parsed with ZERO network calls,
    cached as .npz, and the seed file is NOT deleted (only downloads are)."""
    pairs = [(0, 1), (1, 2), (2, 0)]
    seed = _seed_gz(ds._CACHE_DIR, "seeded.txt.gz", pairs)
    out = ds._load_snap("seeded", "https://snap.example/never-fetched.txt.gz",
                        "Seeded", "d", expected_nodes=3, expected_edges=3)
    assert out["num_edges"] == 3
    assert served["__calls__"] == []
    assert os.path.exists(seed), "pre-seeded raw file must survive"
    assert os.path.exists(os.path.join(ds._CACHE_DIR, "seeded.npz"))


def test_preseeded_plain_txt_accepted(served):
    os.makedirs(ds._CACHE_DIR, exist_ok=True)
    with open(os.path.join(ds._CACHE_DIR, "plainseed.txt"), "w") as f:
        f.write("# hdr\n0 1\n1 2\n")
    out = ds._load_snap("plainseed", "https://snap.example/x.txt.gz",
                        "Plain", "d", expected_nodes=3, expected_edges=2)
    assert out["num_edges"] == 2
    assert served["__calls__"] == []


def test_snap_cache_status(served):
    assert ds.snap_cache_status("facebook") is None
    _seed_gz(ds._CACHE_DIR, "facebook.txt.gz", [(0, 1)])
    assert ds.snap_cache_status("facebook").endswith("facebook.txt.gz")


def _facebook_tar(tmp_path, egos):
    """SNAP-shaped facebook.tar.gz: members facebook/<ego>.edges."""
    import tarfile

    tar_path = os.path.join(ds._CACHE_DIR, "facebook.tar.gz")
    os.makedirs(ds._CACHE_DIR, exist_ok=True)
    with tarfile.open(tar_path, "w:gz") as tf:
        for ego, edges in egos.items():
            body = "".join(f"{a} {b}\n" for a, b in edges).encode()
            info = tarfile.TarInfo(f"facebook/{ego}.edges")
            info.size = len(body)
            tf.addfile(info, io.BytesIO(body))
            # distractor members the parser must ignore
            for suffix in ("circles", "feat"):
                info = tarfile.TarInfo(f"facebook/{ego}.{suffix}")
                info.size = 2
                tf.addfile(info, io.BytesIO(b"x\n"))
    return tar_path


def test_facebook_ego_labels_from_tar(served, tmp_path):
    _facebook_tar(tmp_path, {
        0: [(1, 2), (2, 3)],
        107: [(108, 109)],
        348: [(2, 349)],  # node 2 is shared: lowest ego (0) must win
    })
    labels = ds._facebook_ego_labels()
    # class index = rank of ego id ascending: 0→0, 107→1, 348→2
    assert labels["0"] == 0 and labels["107"] == 1 and labels["348"] == 2
    assert labels["1"] == 0 and labels["108"] == 1 and labels["349"] == 2
    assert labels["2"] == 0, "shared node must take the lowest ego id"
    assert len(set(labels.values())) == 3


def test_facebook_ego_labels_from_extracted_dir(served):
    sub = os.path.join(ds._CACHE_DIR, "facebook")
    os.makedirs(sub, exist_ok=True)
    with open(os.path.join(sub, "0.edges"), "w") as f:
        f.write("1 2\n")
    with open(os.path.join(sub, "107.edges"), "w") as f:
        f.write("108 109\n")
    labels = ds._facebook_ego_labels()
    assert labels == {"0": 0, "1": 0, "2": 0,
                      "107": 1, "108": 1, "109": 1}


def test_facebook_seeded_end_to_end_with_labels(served, tmp_path):
    """The full VERDICT r2 #7 path: seed facebook.txt.gz + facebook.tar.gz,
    then load_dataset('facebook') returns edges AND ego labels offline."""
    rng = np.random.default_rng(1)
    m = 85_000  # within the 20% drift gate of 88,234
    pairs = np.stack([rng.integers(0, 4039, m), rng.integers(0, 4039, m)], 1)
    _seed_gz(ds._CACHE_DIR, "facebook.txt.gz", pairs.tolist())
    _facebook_tar(tmp_path, {0: [(1, 2)], 107: [(108, 109)],
                             348: [(349, 350)], 414: [(415, 416)]})
    out = ds.load_dataset("facebook")
    assert out["num_edges"] == m
    assert out["num_classes"] == 4
    assert out["labels"]["349"] == 2
    assert served["__calls__"] == []


def test_accuracy_report_includes_facebook_when_seeded(served, tmp_path):
    import importlib.util
    import sys as _sys

    spec = importlib.util.spec_from_file_location(
        "accuracy_report",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "accuracy_report.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    _sys.modules["accuracy_report"] = mod
    try:
        spec.loader.exec_module(mod)
        # report consults the SAME monkeypatched module object
        assert "facebook" not in mod.default_datasets()
        _seed_gz(ds._CACHE_DIR, "facebook.txt.gz", [(0, 1)])
        assert mod.default_datasets()[-1] == "facebook"
    finally:
        del _sys.modules["accuracy_report"]
