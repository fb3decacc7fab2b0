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


# Lockstep batch CRC: the byte loop is sequential WITHIN a record but
# independent ACROSS records, so a batch of N frames runs as max_len
# masked numpy steps over N uint32 lanes (the md5np move applied to
# CRC). Records are processed longest-first so the active lane set is
# a shrinking PREFIX — a slice per step, never a boolean mask.
# Records longer than _BATCH_CRC_MAX would stretch the step count for
# the whole batch, so they take the scalar loop instead (rare in
# Example-sized frames; correctness identical either way).
_BATCH_CRC_MAX = 4096


def crc32c_batch(data, starts, lens):
    """CRC32C of N byte slices of ``data`` (numpy uint8 buffer) →
    uint32 array, bit-identical to ``crc32c`` per record.  ~20× the
    scalar loop on Example-sized frames (measured 105 → ~5 ns/byte
    at 2 k × 600 B)."""
    import numpy as np

    n = len(lens)
    tab = np.array(_TABLE, dtype=np.uint32)
    out = np.empty(n, dtype=np.uint32)
    big = lens > _BATCH_CRC_MAX
    if big.any():
        for i in np.nonzero(big)[0]:
            out[i] = crc32c(
                data[starts[i] : starts[i] + lens[i]].tobytes()
            )
    small = np.nonzero(~big)[0]
    if len(small):
        order = small[np.argsort(-lens[small], kind="stable")]
        s_o = starts[order].astype(np.int64)
        l_o = lens[order].astype(np.int64)
        crc = np.full(len(order), 0xFFFFFFFF, dtype=np.uint32)
        # active-lane count per byte position: lens sorted desc, so
        # lanes with len > i form a prefix
        asc = l_o[::-1]
        max_len = int(l_o[0]) if len(l_o) else 0
        ks = len(order) - np.searchsorted(
            asc, np.arange(max_len), side="right"
        )
        for i in range(max_len):
            k = ks[i]
            b = data[s_o[:k] + i]
            idx = (crc[:k] ^ b) & np.uint32(0xFF)
            crc[:k] = tab[idx] ^ (crc[:k] >> np.uint32(8))
        out[order] = crc ^ np.uint32(0xFFFFFFFF)
    return out


def masked_crc_batch(data, starts, lens):
    """Batch counterpart of ``_masked_crc``."""
    import numpy as np

    crc = crc32c_batch(data, starts, lens).astype(np.uint64)
    return (
        (((crc >> np.uint64(15)) | (crc << np.uint64(17)))
         + np.uint64(0xA282EAD8))
        & np.uint64(0xFFFFFFFF)
    ).astype(np.uint32)


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


def _walk_frames(buf: bytes):
    """One pass over a shard's bytes: frame spans + batch-verified
    CRCs (headers and payloads each go through ``masked_crc_batch`` —
    the scalar per-byte loop was the dominant cost of every
    read/count/scan path).  Returns (starts, lens) of the payloads;
    raises AssertionError on any corrupt frame, same contract as the
    old sequential walk."""
    import numpy as np

    spans: list[tuple[int, int]] = []
    hcrcs: list[int] = []
    pcrcs: list[int] = []
    pos = 0
    total = len(buf)
    while pos < total:
        assert total - pos >= 12, "truncated header"
        (length,) = struct.unpack_from("<Q", buf, pos)
        (hcrc,) = struct.unpack_from("<I", buf, pos + 8)
        if total - pos < 16 + length:
            # A flipped bit in the length field reads as truncation;
            # check this header's CRC before trusting the parse.
            assert _masked_crc(buf[pos : pos + 8]) == hcrc, (
                "corrupt length crc"
            )
            raise AssertionError("truncated payload")
        spans.append((pos + 12, length))
        hcrcs.append(hcrc)
        (pcrc,) = struct.unpack_from("<I", buf, pos + 12 + length)
        pcrcs.append(pcrc)
        pos += 16 + length
    if not spans:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    data = np.frombuffer(buf, dtype=np.uint8)
    starts = np.array([s for s, _ in spans], dtype=np.int64)
    lens = np.array([ln for _, ln in spans], dtype=np.int64)
    want_h = masked_crc_batch(
        data, starts - np.int64(12), np.full(len(spans), 8, np.int64)
    )
    assert (want_h == np.array(hcrcs, np.uint32)).all(), (
        "corrupt length crc"
    )
    want_p = masked_crc_batch(data, starts, lens)
    assert (want_p == np.array(pcrcs, np.uint32)).all(), (
        "corrupt payload crc"
    )
    return starts, lens


def read_tfrecords(path: str) -> list[bytes]:
    """Frame-level reader (verifies CRCs) — the test-side ground truth."""
    with open(path, "rb") as f:
        buf = f.read()
    starts, lens = _walk_frames(buf)
    return [
        buf[int(s) : int(s) + int(ln)] for s, ln in zip(starts, lens)
    ]


def count_tfrecords(path: str) -> int:
    """CRC-verified record count of one shard file — the frame walk of
    ``read_tfrecords`` without materializing payload lists. Runs on
    executors for distributed shard verification (see
    queries.rsna_pipeline_counts)."""
    with open(path, "rb") as f:
        buf = f.read()
    starts, _ = _walk_frames(buf)
    return len(starts)


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

    def _frame_partition(rows):
        # encode stays per-row python (it is ~15% of the old cost);
        # the CRCs — the dominant cost — run through the lockstep
        # batch kernel over ~8k-record chunks
        import numpy as np

        chunk: list[bytes] = []
        chunk_bytes = 0

        def _flush():
            nonlocal chunk, chunk_bytes
            if not chunk:
                return
            data = np.frombuffer(b"".join(chunk), dtype=np.uint8)
            lens = np.array([len(p) for p in chunk], dtype=np.int64)
            starts = np.cumsum(lens) - lens
            pcrc = masked_crc_batch(data, starts, lens)
            headers = b"".join(
                struct.pack("<Q", int(ln)) for ln in lens
            )
            hbuf = np.frombuffer(headers, dtype=np.uint8)
            hcrc = masked_crc_batch(
                hbuf,
                np.arange(len(chunk), dtype=np.int64) * 8,
                np.full(len(chunk), 8, dtype=np.int64),
            )
            for i, p in enumerate(chunk):
                yield (
                    headers[i * 8 : i * 8 + 8]
                    + struct.pack("<I", int(hcrc[i]))
                    + p
                    + struct.pack("<I", int(pcrc[i]))
                )
            chunk = []
            chunk_bytes = 0

        for row in rows:
            chunk.append(encode_example(to_features(row)))
            chunk_bytes += len(chunk[-1])
            if len(chunk) >= 8192 or chunk_bytes >= (16 << 20):
                yield from _flush()
        yield from _flush()

    framed = df.rdd.mapPartitions(_frame_partition)
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
