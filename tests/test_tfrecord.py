"""TFRecord sink: framing round-trip + protobuf wire-format goldens."""

from __future__ import annotations

import glob
import struct

from data_pipeline_rsna_spark.sinks import tfrecord as tfr


def test_crc32c_known_vectors():
    # public CRC32C test vectors (RFC 3720 / golang hash/crc32 tests)
    assert tfr.crc32c(b"") == 0
    assert tfr.crc32c(b"123456789") == 0xE3069283
    assert tfr.crc32c(b"a") == 0xC1D04330


def test_varint_golden():
    assert tfr._varint(0) == b"\x00"
    assert tfr._varint(1) == b"\x01"
    assert tfr._varint(300) == b"\xac\x02"


def test_example_encoding_golden():
    # Example{features{feature{key:"a" value{int64_list{value:[1,2]}}}}}
    enc = tfr.encode_example({"a": [1, 2]})
    # outer: field 1 (features), map entry (key "a" = field 1, value
    # Feature = field 2), Feature.int64_list = field 3 (tag 0x1a),
    # Int64List.value packed = field 1
    assert enc == bytes.fromhex("0a0d0a0b0a016112061a040a020102")


def test_frame_roundtrip(tmp_path):
    payloads = [b"hello", b"", b"x" * 1000]
    p = tmp_path / "t.tfrecord"
    with open(p, "wb") as f:
        for pl in payloads:
            f.write(tfr.frame_record(pl))
    assert tfr.read_tfrecords(str(p)) == payloads


def test_write_tfrecord_shards(spark, tmp_path):
    df = spark.range(100).selectExpr("id", "cast(id * 2 as double) as v")
    out = str(tmp_path / "shards")

    def to_features(row):
        return {
            "id": [int(row.id)],
            "v": [float(row.v)],
            "name": [f"rec-{row.id}"],
        }

    tfr.write_tfrecord_shards(df, out, num_shards=4, to_features=to_features)
    files = sorted(glob.glob(f"{out}/*.tfrecord"))
    assert len(files) == 4
    n = sum(len(tfr.read_tfrecords(f)) for f in files)
    assert n == 100
    # spot-check one payload parses as the expected deterministic bytes
    some = tfr.read_tfrecords(files[0])[0]
    assert b"name" in some and b"rec-" in some


def test_float_list_layout():
    enc = tfr._float_list([1.0])
    # field 1, wire 2, len 4, little-endian float 1.0
    assert enc == b"\x0a\x04" + struct.pack("<f", 1.0)
