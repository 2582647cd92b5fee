"""Progress line + torch-free TensorBoard event writer."""
import io
import os
import struct

import numpy as np

from tartangan_tpu.train.progress import ProgressLine
from tartangan_tpu.utils.tb_events import (
    ScalarEventWriter,
    crc32c,
    encode_scalar_event,
    tfrecord,
)


def test_crc32c_known_vector():
    # the canonical CRC32C check value (RFC 3720 appendix B / Castagnoli)
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def _read_records(path):
    records = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                return records
            (length,) = struct.unpack("<Q", header)
            f.read(4)  # length crc
            data = f.read(length)
            f.read(4)  # data crc
            records.append(data)


def _parse_fields(data):
    """Minimal protobuf walk: returns {field_number: [raw values]}."""
    fields = {}
    i = 0
    while i < len(data):
        key = 0
        shift = 0
        while True:
            b = data[i]
            i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        number, wire = key >> 3, key & 7
        if wire == 0:
            val = 0
            shift = 0
            while True:
                b = data[i]
                i += 1
                val |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:
            val = data[i:i + 8]
            i += 8
        elif wire == 5:
            val = data[i:i + 4]
            i += 4
        else:  # length-delimited
            ln = 0
            shift = 0
            while True:
                b = data[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            val = data[i:i + ln]
            i += ln
        fields.setdefault(number, []).append(val)
    return fields


def test_event_file_roundtrip(tmp_path):
    writer = ScalarEventWriter(str(tmp_path / "run"))
    writer.add_scalars(7, {"Trainer/g_loss": 1.25, "Trainer/d_loss": -3.0})
    writer.close()
    files = os.listdir(tmp_path / "run")
    assert len(files) == 1 and files[0].startswith("events.out.tfevents.")

    records = _read_records(str(tmp_path / "run" / files[0]))
    assert len(records) == 2
    version = _parse_fields(records[0])
    assert version[3] == [b"brain.Event:2"]

    event = _parse_fields(records[1])
    assert event[2] == [7]  # step
    values = _parse_fields(event[5][0])[1]
    parsed = {}
    for value in values:
        v = _parse_fields(value)
        parsed[v[1][0].decode()] = struct.unpack("<f", v[2][0])[0]
    assert parsed["Trainer/g_loss"] == 1.25
    assert parsed["Trainer/d_loss"] == -3.0


def test_tfrecord_crcs_verify():
    data = encode_scalar_event(3, {"a": 1.0}, wall_time=123.0)
    rec = tfrecord(data)
    (length,) = struct.unpack("<Q", rec[:8])
    assert length == len(data)
    assert rec[12:12 + length] == data


def test_progress_line_inplace():
    out = io.StringIO()
    p = ProgressLine(newlines=False, stream=out)
    p.epoch_begin(2, 10)
    p.update(100, 3, 8, {"g_loss": np.float32(1.5)})
    p.update(101, 4, 8, {"g_loss": np.float32(1.25)})
    p.epoch_end()
    text = out.getvalue()
    assert text.count("\r") == 2 and text.endswith("\n")
    assert "epoch 2 [4/10] step 101" in text
    assert "g_loss=1.2500" in text


def test_progress_line_newlines():
    out = io.StringIO()
    p = ProgressLine(newlines=True, stream=out)
    p.epoch_begin(1, 5)
    p.update(0, 1, 4, {"d_loss": 0.5})
    p.update(1, 2, 4, {"d_loss": 0.25})
    p.epoch_end()
    lines = [ln for ln in out.getvalue().splitlines() if ln]
    assert len(lines) == 2
    assert "\r" not in out.getvalue()
    assert lines[1].startswith("epoch 1 [2/5] step 1")
