#!/usr/bin/env python
"""Fetch the reference's real datasets into CGLB_DATA_DIR (egress required).

The build/eval environment for this framework has zero network egress, so
experiment runs fall back to clearly-marked synthetic stand-ins
(cglb_tpu/experiments/datasets.py, DatasetBundle.source == "synthetic").
On any machine WITH egress, run this script once; afterwards every loader
resolves to the real data and results carry "data": "real" provenance.

Sources mirror the reference's pipeline (reference: cglb_experiments/
datasets.py:47-76 -> robustgp_experiments.utils.data -> bayesian_benchmarks):

  - snelson1d: Edward Snelson's SPGP 1-D example data (200 points), as
    distributed with the GPflow documentation.
  - Wilson_* UCI suite: the "UCI regression" tarballs used by
    bayesian_benchmarks (Andrew Gordon Wilson's preprocessed sets).

Files land as <CGLB_DATA_DIR>/<name>.npz with X [N, D], Y [N, 1] — the
first (preferred) layout of cglb_tpu.experiments.datasets._load_local.

Integrity: scripts/data_manifest.json pins N/D per dataset (always checked)
and sha256 checksums (checked when present; recorded on first fetch with
--record so a later re-fetch is reproducible).
"""

from __future__ import annotations

import argparse
import hashlib
import io
import json
import os
import sys
import tarfile
import urllib.request
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
MANIFEST = HERE / "data_manifest.json"

# bayesian_benchmarks' UCI mirror (see bayesian_benchmarks/data.py)
UCI_BASE = "https://d2hg8soec8ck9v.cloudfront.net/datasets/uci/{name}.tar.gz"
SNELSON_BASE = (
    "https://raw.githubusercontent.com/GPflow/docs/master/doc/source/"
    "notebooks/basics/data/snelson_{part}.csv"
)

WILSON = {
    "Wilson_bike": "bike",
    "Wilson_elevators": "elevators",
    "Wilson_kin40k": "kin40k",
    "Wilson_pol": "pol",
    "Wilson_protein": "protein",
    "Wilson_keggundirected": "keggundirected",
    "Wilson_houseelectric": "houseelectric",
}


def data_dir() -> Path:
    return Path(os.environ.get("CGLB_DATA_DIR", "~/.datasets")).expanduser()


def sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _download(url: str) -> bytes:
    print(f"  fetching {url}")
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.read()


def fetch_snelson(out: Path) -> Path:
    xs = np.loadtxt(io.BytesIO(_download(SNELSON_BASE.format(part="train_inputs"))))
    ys = np.loadtxt(io.BytesIO(_download(SNELSON_BASE.format(part="train_outputs"))))
    path = out / "snelson1d.npz"
    np.savez(path, X=xs.reshape(-1, 1), Y=ys.reshape(-1, 1))
    return path


def fetch_wilson(name: str, out: Path) -> Path:
    short = WILSON[name]
    blob = _download(UCI_BASE.format(name=short))
    with tarfile.open(fileobj=io.BytesIO(blob), mode="r:gz") as tar:
        member = next(m for m in tar.getmembers() if m.name.endswith(".mat")
                      or m.name.endswith("data.npy") or m.name.endswith(".csv"))
        data = tar.extractfile(member).read()
    if member.name.endswith(".mat"):
        from scipy.io import loadmat

        mat = loadmat(io.BytesIO(data))
        arr = np.asarray(mat["data"], dtype=np.float64)
    elif member.name.endswith(".npy"):
        arr = np.load(io.BytesIO(data))
    else:
        arr = np.loadtxt(io.BytesIO(data), delimiter=",")
    X, Y = arr[:, :-1], arr[:, -1:].reshape(-1, 1)
    path = out / f"{name}.npz"
    np.savez(path, X=X, Y=Y)
    return path


def verify(name: str, path: Path, manifest: dict, record: bool) -> bool:
    entry = manifest.setdefault(name, {})
    with np.load(path) as d:
        n, dim = d["X"].shape
    exp = entry.get("shape")
    if exp and tuple(exp) != (n, dim):
        print(f"  SHAPE MISMATCH for {name}: got {(n, dim)}, manifest {exp}")
        return False
    digest = sha256(path)
    if entry.get("sha256"):
        if entry["sha256"] != digest:
            print(f"  CHECKSUM MISMATCH for {name}")
            return False
        print(f"  ok (sha256 verified) {name}: N={n} D={dim}")
    elif record:
        entry.update(shape=[n, dim], sha256=digest)
        print(f"  recorded {name}: N={n} D={dim} sha256={digest[:12]}...")
    else:
        print(f"  ok (no pinned checksum) {name}: N={n} D={dim} "
              f"sha256={digest[:12]}...")
    return True


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("names", nargs="*", default=[],
                    help="datasets to fetch (default: snelson1d + all Wilson)")
    ap.add_argument("--record", action="store_true",
                    help="record sha256 of fetched files into the manifest")
    args = ap.parse_args(argv)

    names = args.names or (["snelson1d"] + sorted(WILSON))
    out = data_dir()
    out.mkdir(parents=True, exist_ok=True)
    manifest = json.loads(MANIFEST.read_text()) if MANIFEST.exists() else {}

    failures = 0
    for name in names:
        print(name)
        try:
            if name == "snelson1d":
                path = fetch_snelson(out)
            elif name in WILSON:
                path = fetch_wilson(name, out)
            else:
                print(f"  unknown dataset {name!r}")
                failures += 1
                continue
            if not verify(name, path, manifest, args.record):
                failures += 1
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"  FAILED: {type(e).__name__}: {e}")
            failures += 1

    if args.record:
        MANIFEST.write_text(json.dumps(manifest, indent=2, sort_keys=True) + "\n")
        print(f"manifest written: {MANIFEST}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
