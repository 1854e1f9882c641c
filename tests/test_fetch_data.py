"""End-to-end test of the real-data fetch path (scripts/fetch_data.py).

The build environment has zero egress, so the fetch script has never run
against its real sources — but every link in the chain (HTTP download,
tarball extraction, .mat parsing, npz layout, manifest shape+sha256
verification, and loader resolution to ``source == "real"``) is exercised
here against a local HTTP server serving fixture files with the same
formats as the upstream mirrors (reference: cglb_experiments/
datasets.py:47-76 -> bayesian_benchmarks data loaders).
"""

from __future__ import annotations

import http.server
import importlib.util
import io
import json
import tarfile
import threading
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture()
def fetch_mod():
    spec = importlib.util.spec_from_file_location(
        "fetch_data", REPO / "scripts" / "fetch_data.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def docroot(tmp_path):
    """Fixture files in the exact upstream formats."""
    root = tmp_path / "www"
    root.mkdir()
    rng = np.random.default_rng(7)

    # snelson: two whitespace CSVs of 200 floats (GPflow docs layout).
    np.savetxt(root / "snelson_train_inputs.csv", rng.normal(size=200))
    np.savetxt(root / "snelson_train_outputs.csv", rng.normal(size=200))

    # Wilson pol: tar.gz containing a .mat with a single "data" matrix whose
    # last column is the target (bayesian_benchmarks uci tarball layout).
    from scipy.io import savemat

    arr = rng.normal(size=(120, 6))
    buf = io.BytesIO()
    savemat(buf, {"data": arr})
    payload = buf.getvalue()
    with tarfile.open(root / "pol.tar.gz", "w:gz") as tar:
        info = tarfile.TarInfo(name="pol/pol.mat")
        info.size = len(payload)
        tar.addfile(info, io.BytesIO(payload))
    return root, arr


@pytest.fixture()
def server(docroot):
    root, _ = docroot

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(root), **kw)

        def log_message(self, *a):  # keep pytest output clean
            pass

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_fetch_verify_and_load(fetch_mod, docroot, server, tmp_path,
                               monkeypatch):
    _, arr = docroot
    data_dir = tmp_path / "datasets"
    manifest = tmp_path / "manifest.json"
    monkeypatch.setenv("CGLB_DATA_DIR", str(data_dir))
    monkeypatch.setattr(fetch_mod, "MANIFEST", manifest)
    monkeypatch.setattr(fetch_mod, "UCI_BASE", server + "/{name}.tar.gz")
    monkeypatch.setattr(fetch_mod, "SNELSON_BASE",
                        server + "/snelson_{part}.csv")

    # First fetch records shapes + sha256 into the manifest.
    assert fetch_mod.main(["snelson1d", "Wilson_pol", "--record"]) == 0
    pinned = json.loads(manifest.read_text())
    assert pinned["Wilson_pol"]["shape"] == [120, 5]
    assert len(pinned["Wilson_pol"]["sha256"]) == 64
    assert pinned["snelson1d"]["shape"] == [200, 1]

    # npz layout matches the loader's preferred format, content round-trips.
    with np.load(data_dir / "Wilson_pol.npz") as d:
        np.testing.assert_allclose(d["X"], arr[:, :-1])
        np.testing.assert_allclose(d["Y"], arr[:, -1:])

    # A re-fetch against the pinned manifest verifies clean.
    assert fetch_mod.main(["Wilson_pol"]) == 0

    # The experiment loader now resolves to REAL data with train-stat
    # z-scoring — no synthetic stand-in masquerade.
    from cglb_tpu.experiments.datasets import get_dataset

    bundle = get_dataset("Wilson_pol", split=0)
    assert bundle.source == "real" and not bundle.synthetic
    assert bundle.display_name == "Wilson_pol"
    xtr, ytr = bundle.train
    xte, yte = bundle.test
    assert xtr.shape == (80, 5) and xte.shape == (40, 5)
    assert ytr.shape == (80, 1) and yte.shape == (40, 1)
    np.testing.assert_allclose(xtr.mean(0), 0.0, atol=1e-9)
    np.testing.assert_allclose(xtr.std(0), 1.0, atol=1e-4)
    # test split normalized with TRAIN stats: not exactly standard.
    assert abs(float(xte.mean())) > 0

    # snelson resolves to the real file too.
    snel = get_dataset("snelson1d", split=0)
    assert snel.source == "real"
    assert snel.train[0].shape == (134, 1)


def test_fetch_detects_tampering(fetch_mod, docroot, server, tmp_path,
                                 monkeypatch):
    data_dir = tmp_path / "datasets"
    manifest = tmp_path / "manifest.json"
    monkeypatch.setenv("CGLB_DATA_DIR", str(data_dir))
    monkeypatch.setattr(fetch_mod, "MANIFEST", manifest)
    monkeypatch.setattr(fetch_mod, "UCI_BASE", server + "/{name}.tar.gz")

    assert fetch_mod.main(["Wilson_pol", "--record"]) == 0

    # Corrupt the pinned checksum: the next fetch must fail verification.
    pinned = json.loads(manifest.read_text())
    pinned["Wilson_pol"]["sha256"] = "0" * 64
    manifest.write_text(json.dumps(pinned))
    assert fetch_mod.main(["Wilson_pol"]) == 1

    # Wrong pinned shape fails too (and before any checksum logic).
    pinned["Wilson_pol"] = {"shape": [999, 5]}
    manifest.write_text(json.dumps(pinned))
    assert fetch_mod.main(["Wilson_pol"]) == 1
