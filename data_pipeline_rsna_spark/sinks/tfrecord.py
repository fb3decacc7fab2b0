"""TFRecord sink without TensorFlow (SURVEY.md O31/O33/O35).

Both layers of the format are public specifications:

- **tf.train.Example** is a protobuf message; the wire format is the
  standard protobuf encoding (varints + length-delimited fields). The
  reference builds these with TF helper constructors
  (``dataset_util.py:21-38``, ``images_to_tfrecord.py:135-169``); here
  they are encoded directly.
- **TFRecord framing** is ``uint64 length | uint32 masked_crc(length) |
  payload | uint32 masked_crc(payload)`` with CRC32C and the mask
  ``((crc >> 15) | (crc << 17)) + 0xa282ead8``.

In production, prefer the ``spark-tensorflow-connector`` format provider
when its jar is on the classpath; this module is the dependency-free
fallback and the byte-level ground truth for tests.
"""

from __future__ import annotations

import struct
from collections.abc import Iterable

# ---------------------------------------------------------------------------
# CRC32C (Castagnoli), table-driven
# ---------------------------------------------------------------------------

_CRC32C_POLY = 0x82F63B78
_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ _CRC32C_POLY if _c & 1 else _c >> 1
    _TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# protobuf wire encoding for tf.train.Example
# ---------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _bytes_list(values: Iterable[bytes]) -> bytes:
    # BytesList { repeated bytes value = 1; }
    return b"".join(_len_delim(1, v) for v in values)


def _int64_list(values: Iterable[int]) -> bytes:
    # Int64List { repeated int64 value = 1 [packed=true]; }
    packed = b"".join(_varint(v & 0xFFFFFFFFFFFFFFFF) for v in values)
    return _len_delim(1, packed)


def _float_list(values: Iterable[float]) -> bytes:
    # FloatList { repeated float value = 1 [packed=true]; }
    packed = b"".join(struct.pack("<f", v) for v in values)
    return _len_delim(1, packed)


def encode_feature(value: list) -> bytes:
    """Feature { oneof: BytesList=1, FloatList=2, Int64List=3 } — the
    dataset_util.py:21-38 constructors, chosen by element type."""
    if not value:
        return _len_delim(3, _int64_list([]))
    v0 = value[0]
    if isinstance(v0, bytes):
        return _len_delim(1, _bytes_list(value))
    if isinstance(v0, str):
        return _len_delim(1, _bytes_list([s.encode("utf8") for s in value]))
    if isinstance(v0, float):
        return _len_delim(2, _float_list(value))
    if isinstance(v0, int):
        return _len_delim(3, _int64_list(value))
    raise TypeError(f"unsupported feature element type {type(v0).__name__}")


def encode_example(features: dict[str, list]) -> bytes:
    """Example { Features features = 1 }; Features { map<string,Feature>
    features = 1 }. Map entries are encoded as repeated (key=1, value=2)
    submessages, sorted by key for deterministic output."""
    entries = b""
    for name in sorted(features):
        entry = _len_delim(1, name.encode("utf8")) + _len_delim(
            2, encode_feature(features[name])
        )
        entries += _len_delim(1, entry)
    return _len_delim(1, entries)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated protobuf varint")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 63:
            raise ValueError("protobuf varint too long")


def _skip_field(data: bytes, pos: int, wire: int) -> int:
    if wire == 0:
        _, pos = _read_varint(data, pos)
        return pos
    if wire == 1:
        return pos + 8
    if wire == 2:
        ln, pos = _read_varint(data, pos)
        return pos + ln
    if wire == 5:
        return pos + 4
    raise ValueError(f"unsupported protobuf wire type {wire}")


def _decode_feature(data: bytes) -> list:
    """Inverse of ``encode_feature``: one Feature submessage → python
    list (bytes / int / float, per the oneof arm present)."""
    pos = 0
    values: list = []
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        field, wire = tag >> 3, tag & 7
        if wire != 2:
            pos = _skip_field(data, pos, wire)
            continue
        ln, pos = _read_varint(data, pos)
        body = data[pos:pos + ln]
        if len(body) != ln:
            raise ValueError("truncated Feature submessage")
        pos += ln
        i = 0
        while i < len(body):
            t, i = _read_varint(body, i)
            f, w = t >> 3, t & 7
            if field == 1 and f == 1 and w == 2:  # BytesList.value
                vl, i = _read_varint(body, i)
                values.append(body[i:i + vl])
                i += vl
            elif field == 2 and f == 1 and w == 2:  # FloatList packed
                pl, i = _read_varint(body, i)
                values.extend(
                    struct.unpack(f"<{pl // 4}f", body[i:i + pl])
                )
                i += pl
            elif field == 2 and f == 1 and w == 5:  # FloatList unpacked
                values.append(struct.unpack("<f", body[i:i + 4])[0])
                i += 4
            elif field == 3 and f == 1 and w == 2:  # Int64List packed
                pl, i = _read_varint(body, i)
                end = i + pl
                while i < end:
                    v, i = _read_varint(body, i)
                    # two's-complement back to signed int64
                    values.append(v - (1 << 64) if v >= (1 << 63) else v)
            elif field == 3 and f == 1 and w == 0:  # Int64List unpacked
                v, i = _read_varint(body, i)
                values.append(v - (1 << 64) if v >= (1 << 63) else v)
            else:
                i = _skip_field(body, i, w)
    return values


def decode_example(payload: bytes) -> dict[str, list]:
    """Inverse of ``encode_example``: tf.train.Example wire bytes →
    ``{feature_name: list}``. From-scratch varint walk (same layer as
    the encoder above); the read side of the TFRecord interchange a
    reference user already has on disk (images_to_tfrecord.py:228-231
    writes these via TF; this decodes them without it)."""
    pos = 0
    features: dict[str, list] = {}
    while pos < len(payload):
        tag, pos = _read_varint(payload, pos)
        field, wire = tag >> 3, tag & 7
        if field != 1 or wire != 2:  # Example.features
            pos = _skip_field(payload, pos, wire)
            continue
        ln, pos = _read_varint(payload, pos)
        fmsg = payload[pos:pos + ln]
        pos += ln
        i = 0
        while i < len(fmsg):
            t, i = _read_varint(fmsg, i)
            f, w = t >> 3, t & 7
            if f != 1 or w != 2:  # Features.feature map entry
                i = _skip_field(fmsg, i, w)
                continue
            el, i = _read_varint(fmsg, i)
            entry = fmsg[i:i + el]
            i += el
            j = 0
            name: str | None = None
            value: list = []
            while j < len(entry):
                et, j = _read_varint(entry, j)
                ef, ew = et >> 3, et & 7
                if ef == 1 and ew == 2:  # key
                    kl, j = _read_varint(entry, j)
                    name = entry[j:j + kl].decode("utf8")
                    j += kl
                elif ef == 2 and ew == 2:  # value (Feature)
                    vl, j = _read_varint(entry, j)
                    value = _decode_feature(entry[j:j + vl])
                    j += vl
                else:
                    j = _skip_field(entry, j, ew)
            if name is not None:
                features[name] = value
    return features


# ---------------------------------------------------------------------------
# TFRecord framing + partition writer
# ---------------------------------------------------------------------------


def frame_record(payload: bytes) -> bytes:
    header = struct.pack("<Q", len(payload))
    return (
        header
        + struct.pack("<I", _masked_crc(header))
        + payload
        + struct.pack("<I", _masked_crc(payload))
    )


def read_tfrecords(path: str) -> list[bytes]:
    """Frame-level reader (verifies CRCs) — the test-side ground truth."""
    out = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                return out
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header), "corrupt length crc"
            payload = f.read(length)
            (pcrc,) = struct.unpack("<I", f.read(4))
            assert pcrc == _masked_crc(payload), "corrupt payload crc"
            out.append(payload)


def count_tfrecords(path: str) -> int:
    """CRC-verified record count of one shard file — the frame walk of
    ``read_tfrecords`` without materializing payload lists. Runs on
    executors for distributed shard verification (see
    queries.rsna_pipeline_counts)."""
    n = 0
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                return n
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header), "corrupt length crc"
            payload = f.read(length)
            (pcrc,) = struct.unpack("<I", f.read(4))
            assert pcrc == _masked_crc(payload), "corrupt payload crc"
            n += 1


def write_tfrecord_shards(df, out_dir: str, num_shards: int,
                          to_features) -> None:
    """O33: one ``-%05d-of-%05d.tfrecord`` file per shard (the
    reference's shard filename pattern, images_to_tfrecord.py:229).
    ``to_features(row) -> dict[str, list]`` maps a row to its Example
    feature dict. Runs on executors — no driver materialization.

    The Python proto encode runs at the INPUT's parallelism (a map on
    the source partitions), and only then do the framed byte blobs
    shuffle into ``num_shards`` writer tasks that concatenate bytes to
    disk. Encoding inside the writer tasks — the previous shape —
    pinned the CPU-heavy step to num_shards tasks, which starves a
    small-shard-count gate (4 writers on a 32-core box) and at cluster
    scale couples encode parallelism to the file-count contract."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    framed = df.rdd.map(
        lambda row: frame_record(encode_example(to_features(row)))
    )
    if framed.getNumPartitions() != num_shards:
        framed = framed.repartition(num_shards)

    def write_partition(it):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = os.path.join(
            out_dir, f"data-{pid:05d}-of-{num_shards:05d}.tfrecord"
        )
        with open(fname, "wb") as f:
            for blob in it:
                f.write(blob)

    framed.foreachPartition(write_partition)
