"""From-scratch Avro object-container codec: binary encoding + container
framing, typed against Arrow schemas. Public knowledge only — the Apache
Avro 1.11 specification (binary encoding: zigzag-varint longs, length-
prefixed bytes/strings, union-index prefixes; object container files:
``Obj\\x01`` magic, metadata map with ``avro.schema``/``avro.codec``,
16-byte sync marker between blocks; ``deflate`` codec = raw RFC-1951
deflate). No avro library exists in this container, so the codec is
hand-rolled the same way the repo's Netpbm/WAV/WARC codecs are.

Reference analogs (semantics only, no code): Avro is the reference's
native record format — AvroHdfsDataWriter
(gobblin-core/src/main/java/org/apache/gobblin/writer/AvroHdfsDataWriter.java:1)
writes object-container files through DataFileWriter, and the
json→record converter family
(gobblin-core/.../converter/avro/JsonIntermediateToAvroConverter.java:1,
JsonElementConversionFactory.java scalar lattice) builds typed records
from JSON. Here the writer encodes one Arrow block per container block
(vectorized column → Python value extraction, one tight per-row encode
loop — Avro is row-oriented by construction, the same per-row boundary
as the WARC/image codecs), and the reader decodes back to Arrow.

Type lattice (Arrow <-> Avro):
  string        <-> "string"         int8/16/32 <-> "int"
  binary        <-> "bytes"          int64      <-> "long"
  bool          <-> "boolean"        float32    <-> "float"
  timestamp[us] <-> long + logicalType timestamp-micros
  timestamp[ms] <-> long + logicalType timestamp-millis
  date32        <-> int  + logicalType date
  float64       <-> "double"
  struct        <-> record (nested, named by field path)
  list<T>       <-> array<T>
Every field is written as the nullable union ["null", T] (the lake's
additive-evolution rule makes all columns nullable); union-of-null-only
columns (pa.null()) encode as "null".
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

import numpy as np
import pyarrow as pa

MAGIC = b"Obj\x01"

# ------------------------------------------------------------ primitives


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _write_long(buf: bytearray, n: int) -> None:
    u = _zigzag(int(n)) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _read_long(mv: memoryview, pos: int) -> tuple[int, int]:
    u = 0
    shift = 0
    while True:
        b = mv[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(u), pos
        shift += 7


def _write_bytes(buf: bytearray, b: bytes) -> None:
    _write_long(buf, len(b))
    buf += b


def _read_bytes(mv: memoryview, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(mv, pos)
    return bytes(mv[pos:pos + n]), pos + n


# ------------------------------------------------------- schema mapping

_PRIMITIVE_TO_AVRO = {
    pa.string(): "string",
    pa.large_string(): "string",
    pa.binary(): "bytes",
    pa.large_binary(): "bytes",
    pa.bool_(): "boolean",
    pa.int8(): "int",
    pa.int16(): "int",
    pa.int32(): "int",
    pa.int64(): "long",
    pa.float32(): "float",
    pa.float64(): "double",
}


def _avro_type(t: pa.DataType, path: str) -> object:
    if t in _PRIMITIVE_TO_AVRO:
        return _PRIMITIVE_TO_AVRO[t]
    if pa.types.is_null(t):
        return "null"
    if pa.types.is_timestamp(t) and t.unit == "us":
        return {"type": "long", "logicalType": "timestamp-micros"}
    if pa.types.is_timestamp(t) and t.unit == "ms":
        return {"type": "long", "logicalType": "timestamp-millis"}
    if pa.types.is_date32(t):
        return {"type": "int", "logicalType": "date"}
    if pa.types.is_struct(t):
        return {
            "type": "record",
            "name": f"r_{path}",
            "fields": [
                {
                    "name": f.name,
                    "type": _nullable(
                        _avro_type(f.type, f"{path}_{f.name}")
                    ),
                    "default": None,
                }
                for f in t
            ],
        }
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return {
            "type": "array",
            "items": _nullable(_avro_type(t.value_type, f"{path}_item")),
        }
    raise TypeError(f"no Avro mapping for Arrow type {t} at {path!r}")


def _nullable(avro_t: object) -> object:
    """Wrap in the standard ["null", T] union — except bare "null",
    which stays bare: ["null", "null"] is an invalid Avro union (a
    union may not contain two identical branches)."""
    return avro_t if avro_t == "null" else ["null", avro_t]


def arrow_to_avro_schema(schema: pa.Schema, name: str = "Record") -> dict:
    """Arrow schema -> Avro record schema (every field a nullable union,
    matching the lake's all-columns-nullable evolution rule)."""
    fields = []
    for f in schema:
        fields.append({
            "name": f.name,
            "type": _nullable(_avro_type(f.type, f.name)),
            "default": None,
        })
    return {"type": "record", "name": name, "fields": fields}


def _arrow_type_of(avro_t: object) -> pa.DataType:
    """Inverse lattice: Avro type (union-unwrapped) -> Arrow type."""
    if isinstance(avro_t, list):  # union: use the non-null branch
        branches = [b for b in avro_t if b != "null"]
        if not branches:
            return pa.null()
        return _arrow_type_of(branches[0])
    if isinstance(avro_t, dict):
        lt = avro_t.get("logicalType")
        if lt == "timestamp-micros":
            return pa.timestamp("us")
        if lt == "timestamp-millis":
            return pa.timestamp("ms")
        if lt == "date":
            return pa.date32()
        if avro_t.get("type") == "record":
            return pa.struct([
                pa.field(f["name"], _arrow_type_of(f["type"]))
                for f in avro_t["fields"]
            ])
        if avro_t.get("type") == "array":
            return pa.list_(_arrow_type_of(avro_t["items"]))
        return _arrow_type_of(avro_t["type"])
    prim = {
        "string": pa.string(), "bytes": pa.binary(), "boolean": pa.bool_(),
        "int": pa.int32(), "long": pa.int64(), "float": pa.float32(),
        "double": pa.float64(), "null": pa.null(),
    }
    if avro_t in prim:
        return prim[avro_t]
    raise TypeError(f"no Arrow mapping for Avro type {avro_t!r}")


def avro_to_arrow_schema(avro_schema: dict) -> pa.Schema:
    return pa.schema([
        pa.field(f["name"], _arrow_type_of(f["type"]))
        for f in avro_schema["fields"]
    ])


# ----------------------------------------------------------- value encode


def _encoder_for(avro_t: object):
    """Return encode(buf, value) for a union-unwrapped Avro type. ``value``
    is a plain Python value (from Arrow ``to_pylist``); None never reaches
    the encoder (the union index handles it)."""
    if isinstance(avro_t, dict):
        lt = avro_t.get("logicalType")
        if lt in ("timestamp-micros", "timestamp-millis"):
            unit_us = lt == "timestamp-micros"

            def enc_ts(buf, v, _us=unit_us):
                if hasattr(v, "timestamp"):  # datetime from to_pylist
                    import datetime as _dt

                    epoch = _dt.datetime(1970, 1, 1)
                    micros = round((v - epoch).total_seconds() * 1e6)
                    _write_long(buf, micros if _us else micros // 1000)
                else:
                    _write_long(buf, int(v))
            return enc_ts
        if lt == "date":
            def enc_date(buf, v):
                if hasattr(v, "toordinal"):
                    _write_long(buf, v.toordinal() - 719163)
                else:
                    _write_long(buf, int(v))
            return enc_date
        if avro_t.get("type") == "record":
            subs = [
                (f["name"], _encoder_for(_non_null(f["type"])),
                 isinstance(f["type"], list))
                for f in avro_t["fields"]
            ]

            def enc_rec(buf, v, _subs=subs):
                for name, enc, is_union in _subs:
                    x = v.get(name)
                    if not is_union:  # bare "null": zero bytes per spec
                        continue
                    if x is None:
                        _write_long(buf, 0)
                    else:
                        _write_long(buf, 1)
                        enc(buf, x)
            return enc_rec
        if avro_t.get("type") == "array":
            item = _encoder_for(_non_null(avro_t["items"]))
            item_union = isinstance(avro_t["items"], list)

            def enc_arr(buf, v, _item=item, _u=item_union):
                if len(v):
                    _write_long(buf, len(v))
                    for x in v:
                        if not _u:  # items are bare "null": zero bytes
                            continue
                        if x is None:
                            _write_long(buf, 0)
                        else:
                            _write_long(buf, 1)
                            _item(buf, x)
                _write_long(buf, 0)
            return enc_arr
        return _encoder_for(avro_t["type"])
    if avro_t in ("int", "long"):
        return _write_long
    if avro_t == "string":
        return lambda buf, v: _write_bytes(buf, v.encode("utf-8"))
    if avro_t == "bytes":
        return _write_bytes
    if avro_t == "boolean":
        return lambda buf, v: buf.append(1 if v else 0)
    if avro_t == "double":
        return lambda buf, v: buf.extend(struct.pack("<d", v))
    if avro_t == "float":
        return lambda buf, v: buf.extend(struct.pack("<f", v))
    if avro_t == "null":
        return lambda buf, v: None
    raise TypeError(f"no encoder for Avro type {avro_t!r}")


def _non_null(t: object) -> object:
    if isinstance(t, list):
        branches = [b for b in t if b != "null"]
        return branches[0] if branches else "null"
    return t


def encode_block(table: pa.Table, avro_schema: dict) -> bytes:
    """Encode one Arrow table as the concatenated Avro binary records of a
    container block (uncompressed payload; count = table.num_rows).

    Timestamp columns are pre-converted to int64 micros vectorized (the
    per-row encoder then writes plain longs) — the only per-row work is
    the tight union-index + primitive encode loop."""
    buf = bytearray()
    cols = []
    encs = []
    unions = []
    for f in avro_schema["fields"]:
        col = table.column(f["name"])
        t = _non_null(f["type"])
        if isinstance(t, dict) and t.get("logicalType") in (
            "timestamp-micros", "timestamp-millis"
        ):
            unit = "us" if t["logicalType"] == "timestamp-micros" else "ms"
            col = col.cast(pa.timestamp(unit)).cast(pa.int64())
        elif isinstance(t, dict) and t.get("logicalType") == "date":
            col = col.cast(pa.date32()).cast(pa.int32())
        cols.append(col.to_pylist())
        encs.append(_encoder_for(t))
        unions.append(isinstance(f["type"], list))
    for row in range(table.num_rows):
        for ci in range(len(cols)):
            if not unions[ci]:  # bare "null" field: zero bytes per spec
                continue
            v = cols[ci][row]
            if v is None:
                _write_long(buf, 0)
            else:
                _write_long(buf, 1)
                encs[ci](buf, v)
    return bytes(buf)


# ----------------------------------------------------------- value decode


def _decoder_for(avro_t: object):
    """Return decode(mv, pos) -> (value, pos) for a union-unwrapped type."""
    if isinstance(avro_t, dict):
        if avro_t.get("type") == "record":
            subs = [
                (f["name"], _decoder_for(_non_null(f["type"])),
                 isinstance(f["type"], list))
                for f in avro_t["fields"]
            ]

            def dec_rec(mv, pos, _subs=subs):
                out = {}
                for name, dec, is_union in _subs:
                    if not is_union:  # bare "null": zero bytes per spec
                        out[name] = None
                        continue
                    ix, pos = _read_long(mv, pos)
                    if ix == 0:
                        out[name] = None
                    else:
                        out[name], pos = dec(mv, pos)
                return out, pos
            return dec_rec
        if avro_t.get("type") == "array":
            item = _decoder_for(_non_null(avro_t["items"]))
            item_union = isinstance(avro_t["items"], list)

            def dec_arr(mv, pos, _item=item, _u=item_union):
                out = []
                while True:
                    n, pos = _read_long(mv, pos)
                    if n == 0:
                        return out, pos
                    if n < 0:  # block with byte-size prefix
                        _, pos = _read_long(mv, pos)
                        n = -n
                    for _ in range(n):
                        if not _u:  # bare "null" items: zero bytes
                            out.append(None)
                            continue
                        ix, pos = _read_long(mv, pos)
                        if ix == 0:
                            out.append(None)
                        else:
                            v, pos = _item(mv, pos)
                            out.append(v)
            return dec_arr
        return _decoder_for(avro_t["type"])  # logical types ride the base
    if avro_t in ("int", "long"):
        return _read_long
    if avro_t == "string":
        def dec_str(mv, pos):
            b, pos = _read_bytes(mv, pos)
            return b.decode("utf-8"), pos
        return dec_str
    if avro_t == "bytes":
        return _read_bytes
    if avro_t == "boolean":
        return lambda mv, pos: (mv[pos] == 1, pos + 1)
    if avro_t == "double":
        return lambda mv, pos: (
            struct.unpack_from("<d", mv, pos)[0], pos + 8
        )
    if avro_t == "float":
        return lambda mv, pos: (
            struct.unpack_from("<f", mv, pos)[0], pos + 4
        )
    if avro_t == "null":
        return lambda mv, pos: (None, pos)
    raise TypeError(f"no decoder for Avro type {avro_t!r}")


def decode_block(payload: bytes, count: int, avro_schema: dict) -> pa.Table:
    """Decode one container block's records into an Arrow table typed by
    the inverse lattice (timestamps come back as timestamp[us/ms] etc.)."""
    mv = memoryview(payload)
    pos = 0
    names = [f["name"] for f in avro_schema["fields"]]
    decs = [_decoder_for(_non_null(f["type"])) for f in avro_schema["fields"]]
    unions = [isinstance(f["type"], list) for f in avro_schema["fields"]]
    cols: list[list] = [[] for _ in names]
    for _ in range(count):
        for ci, dec in enumerate(decs):
            if not unions[ci]:  # bare "null" field: zero bytes per spec
                cols[ci].append(None)
                continue
            ix, pos = _read_long(mv, pos)
            if ix == 0:
                cols[ci].append(None)
            else:
                v, pos = dec(mv, pos)
                cols[ci].append(v)
    arrays = []
    schema = avro_to_arrow_schema(avro_schema)
    for ci, f in enumerate(schema):
        t = f.type
        if pa.types.is_timestamp(t):
            arrays.append(pa.array(cols[ci], pa.int64()).cast(t))
        elif pa.types.is_date32(t):
            arrays.append(pa.array(cols[ci], pa.int32()).cast(t))
        else:
            arrays.append(pa.array(cols[ci], t))
    return pa.Table.from_arrays(arrays, schema=schema)


# -------------------------------------------------------- container file


def write_container(
    table: pa.Table,
    path_or_file,
    codec: str = "deflate",
    sync: bytes | None = None,
    rows_per_block: int = 8192,
) -> None:
    """Write one Avro object-container file. ``sync`` defaults to a
    DETERMINISTIC marker derived from the content (16 bytes of the block
    payload's blake2b) so a retried task writes byte-identical files —
    the FsDataWriter idempotence posture."""
    import hashlib

    avro_schema = arrow_to_avro_schema(table.schema)
    blocks = []
    for off in range(0, max(table.num_rows, 1), rows_per_block):
        chunk = table.slice(off, rows_per_block)
        if chunk.num_rows == 0 and table.num_rows > 0:
            continue
        blocks.append((chunk.num_rows, encode_block(chunk, avro_schema)))
    if sync is None:
        h = hashlib.blake2b(digest_size=16)
        h.update(json.dumps(avro_schema, sort_keys=True).encode())
        for _, payload in blocks:
            h.update(payload)
        sync = h.digest()
    buf = bytearray()
    buf += MAGIC
    meta = {
        "avro.schema": json.dumps(avro_schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    _write_long(buf, len(meta))
    for k, v in sorted(meta.items()):
        _write_bytes(buf, k.encode("utf-8"))
        _write_bytes(buf, v)
    _write_long(buf, 0)
    buf += sync
    for count, payload in blocks:
        if count == 0:
            continue
        if codec == "deflate":
            payload = zlib.compress(payload)[2:-4]  # raw RFC-1951 stream
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        _write_long(buf, count)
        _write_long(buf, len(payload))
        buf += payload
        buf += sync
    if hasattr(path_or_file, "write"):
        path_or_file.write(bytes(buf))
    else:
        with open(path_or_file, "wb") as f:
            f.write(bytes(buf))


def _read_header(mv: memoryview) -> tuple[dict, int]:
    """Parse the container header (magic + metadata map) -> (meta, pos).
    ONE implementation shared by read_container and container_schema
    (review finding: two copies of the header loop can silently
    desync)."""
    if bytes(mv[:4]) != MAGIC:
        raise ValueError("not an Avro object container (bad magic)")
    pos = 4
    meta = {}
    while True:
        n, pos = _read_long(mv, pos)
        if n == 0:
            break
        if n < 0:  # size-prefixed map block
            _, pos = _read_long(mv, pos)
            n = -n
        for _ in range(n):
            k, pos = _read_bytes(mv, pos)
            v, pos = _read_bytes(mv, pos)
            meta[k.decode()] = v
    return meta, pos


def read_container(path_or_bytes) -> pa.Table:
    """Read one Avro object-container file back to Arrow."""
    if isinstance(path_or_bytes, (bytes, bytearray, memoryview)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    mv = memoryview(data)
    meta, pos = _read_header(mv)
    avro_schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    sync = bytes(mv[pos:pos + 16])
    pos += 16
    tables = []
    while pos < len(mv):
        count, pos = _read_long(mv, pos)
        size, pos = _read_long(mv, pos)
        payload = bytes(mv[pos:pos + size])
        pos += size
        if bytes(mv[pos:pos + 16]) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        pos += 16
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        tables.append(decode_block(payload, count, avro_schema))
    if not tables:
        return pa.Table.from_arrays(
            [pa.array([], f.type) for f in avro_to_arrow_schema(avro_schema)],
            schema=avro_to_arrow_schema(avro_schema),
        )
    return pa.concat_tables(tables)


def container_schema(path: str) -> pa.Schema:
    """Read ONLY the container header (magic + metadata map) and return
    the Arrow schema — the cheap schema probe bootstrap needs before
    launching the distributed read (parquet's ``pq.read_schema``
    analog; Avro's schema lives in the file header, so this reads a few
    KB regardless of file size)."""
    with open(path, "rb") as f:
        head = f.read(1 << 20)  # header is tiny; 1 MB covers huge schemas
    try:
        meta, _pos = _read_header(memoryview(head))
    except IndexError:
        raise ValueError(
            f"Avro container header in {path!r} exceeds the 1 MB probe "
            "window — read the full file via read_container"
        ) from None
    return avro_to_arrow_schema(json.loads(meta["avro.schema"].decode()))


def read_avro_source(paths, **kw):
    """Distributed Avro container source: list files, read bytes in
    parallel tasks (``read_binary_files`` — one task per file, the WARC
    source's shape), decode each container to Arrow in the task. Column
    pruning happens post-decode (Avro is row-major; there is no row-group
    projection to push down — documented format trade vs Parquet)."""
    import ray.data as rd

    # suffix filter is the invariant export_avro's tmp naming relies on
    # (a crashed attempt's non-.avro tmp must never poison reads)
    ds = rd.read_binary_files(
        paths, include_paths=False, file_extensions=["avro"], **kw
    )

    def decode(t: pa.Table) -> pa.Table:
        parts = [read_container(b.as_py()) for b in t.column("bytes")]
        return pa.concat_tables(parts) if parts else pa.table({})

    decode.__name__ = "avro_decode"
    return ds.map_batches(decode, batch_format="pyarrow", batch_size=None)
