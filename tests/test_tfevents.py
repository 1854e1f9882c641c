"""The first-party TFEvent writer must produce files TensorBoard can read.

Oracle: TensorFlow's own TFRecord reader + Event proto parser (available in
this environment; the test degrades to a structural check without it).
"""

import glob
import os
import struct

import numpy as np
import pytest

from cglb_tpu.utils.tfevents import EventFileWriter, _crc32c, _masked_crc


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert _crc32c(b"") == 0x00000000
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(bytes(32)) == 0x8A9136AA


def _write_sample(tmp_path):
    w = EventFileWriter(str(tmp_path))
    w.add_scalar("loss", 1.5, 0)
    w.add_scalar("loss", 0.75, 10)
    w.add_scalar("test/rmse", 0.33, 10)
    w.close()
    files = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert len(files) == 1
    return files[0]


def test_tfrecord_framing_and_crc(tmp_path):
    path = _write_sample(tmp_path)
    records = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header)
            payload = f.read(length)
            (pcrc,) = struct.unpack("<I", f.read(4))
            assert pcrc == _masked_crc(payload)
            records.append(payload)
    # version record + 3 scalars
    assert len(records) == 4
    assert b"brain.Event:2" in records[0]


def test_tensorboard_reads_it(tmp_path):
    tf = pytest.importorskip("tensorflow")
    path = _write_sample(tmp_path)
    got = []
    for raw in tf.data.TFRecordDataset(path):
        ev = tf.compat.v1.Event.FromString(raw.numpy())
        for v in ev.summary.value:
            got.append((v.tag, ev.step, v.simple_value))
    assert ("loss", 0, 1.5) in [(t, s, round(val, 6)) for t, s, val in got]
    tags = {t for t, _, _ in got}
    assert tags == {"loss", "test/rmse"}
    steps = sorted(s for t, s, _ in got if t == "loss")
    assert steps == [0, 10]
    vals = {(t, s): val for t, s, val in got}
    np.testing.assert_allclose(vals[("test/rmse", 10)], 0.33, rtol=1e-6)


def test_logger_writes_tb_without_torch(tmp_path, monkeypatch):
    """Logger gets a TB sink through the first-party writer path."""
    from cglb_tpu.utils import logging as L

    logger = L.Logger(
        logdir=str(tmp_path),
        metrics_fn=lambda: {"loss": 1.0, "train/rmse": 0.5, "skipme": 2.0},
        model_parameters_fn=lambda: {".kernel.variance": np.asarray(1.2)},
        holdout_interval=1,
    )
    assert logger._tb is not None
    logger(None)
    logger._tb.close()
    files = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert files and os.path.getsize(files[0]) > 0
