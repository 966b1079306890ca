"""TF tensor_bundle reader test against a hand-built minimal bundle.

TensorFlow is not available in this image to produce a real checkpoint, so
this constructs a tensor_bundle (.index LevelDB table of BundleEntryProto +
.data shard) byte-by-byte from the on-disk format spec and round-trips it
through ``read_tf_checkpoint``'s pure-python path.
"""

import struct

import numpy as np
import pytest

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.checkpoint.tf_bundle import (
    _read_pure_python,
    _snappy_decompress,
)

MAGIC = b"\x57\xfb\x80\x8b\x24\x75\x47\xdb"


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _record(key: bytes, value: bytes, prev_key: bytes = b"") -> bytes:
    shared = 0
    while shared < min(len(key), len(prev_key)) and key[shared] == prev_key[shared]:
        shared += 1
    return (
        _varint(shared)
        + _varint(len(key) - shared)
        + _varint(len(value))
        + key[shared:]
        + value
    )


def _block(records: list[tuple[bytes, bytes]]) -> bytes:
    body = bytearray()
    prev = b""
    for k, v in records:
        body += _record(k, v, prev)
        prev = k
    body += struct.pack("<I", 0)  # restart point at 0
    body += struct.pack("<I", 1)  # one restart
    return bytes(body)


def _shape_proto(shape) -> bytes:
    out = bytearray()
    for d in shape:
        dim = _varint((1 << 3) | 0) + _varint(d)  # TensorShapeProto.Dim.size
        out += _varint((2 << 3) | 2) + _varint(len(dim)) + dim
    return bytes(out)


def _bundle_entry(dtype: int, shape, shard: int, offset: int, size: int) -> bytes:
    shape_p = _shape_proto(shape)
    out = bytearray()
    out += _varint((1 << 3) | 0) + _varint(dtype)
    out += _varint((2 << 3) | 2) + _varint(len(shape_p)) + shape_p
    out += _varint((3 << 3) | 0) + _varint(shard)
    out += _varint((4 << 3) | 0) + _varint(offset)
    out += _varint((5 << 3) | 0) + _varint(size)
    return bytes(out)


def _build_index(entries: dict[bytes, bytes]) -> bytes:
    """One data block + index block + footer, uncompressed."""
    data_block = _block(sorted(entries.items()))
    file_ = bytearray()
    file_ += data_block
    file_ += b"\x00"  # compression: none
    file_ += b"\x00\x00\x00\x00"  # crc (unchecked by the reader)
    data_off, data_size = 0, len(data_block)

    index_block = _block(
        [(b"\xff", _varint(data_off) + _varint(data_size))]
    )
    idx_off = len(file_)
    file_ += index_block + b"\x00" + b"\x00\x00\x00\x00"

    footer = bytearray()
    footer += _varint(0) + _varint(0)  # metaindex handle (empty)
    footer += _varint(idx_off) + _varint(len(index_block))
    footer += b"\x00" * (40 - len(footer))
    footer += MAGIC
    file_ += footer
    return bytes(file_)


def test_roundtrip_minimal_bundle(tmp_path):
    w = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = np.array([1, -2, 3], dtype=np.int64)
    data = w.tobytes() + b.tobytes()
    entries = {
        b"": _bundle_entry(0, [], 0, 0, 0),  # header entry
        b"layer/w": _bundle_entry(1, [3, 4], 0, 0, w.nbytes),
        b"layer/b": _bundle_entry(9, [3], 0, w.nbytes, b.nbytes),
    }
    prefix = tmp_path / "model.ckpt-1"
    (tmp_path / "model.ckpt-1.index").write_bytes(_build_index(entries))
    (tmp_path / "model.ckpt-1.data-00000-of-00001").write_bytes(data)

    out = _read_pure_python(str(prefix))
    assert set(out) == {"layer/w", "layer/b"}
    np.testing.assert_array_equal(out["layer/w"], w)
    np.testing.assert_array_equal(out["layer/b"], b)


def test_snappy_literal_and_copy():
    # literal "abcd" + copy of 4 bytes at offset 4 => "abcdabcd"
    payload = bytes([8]) + _varint(0)[0:0]  # placeholder, rebuilt below
    data = bytearray()
    data += _varint(8)  # uncompressed length
    data += bytes([(4 - 1) << 2]) + b"abcd"  # literal len 4
    data += bytes([((4 - 4) << 2) | 1, 4])  # type-1 copy: len 4, offset 4
    assert _snappy_decompress(bytes(data)) == b"abcdabcd"
