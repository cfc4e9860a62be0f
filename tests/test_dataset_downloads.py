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
