"""Pure-Python Avro binary codec + Confluent wire framing.

The reference's entire ingest path is Confluent-framed Avro: a 5-byte
header (magic ``0x00`` + big-endian u32 schema id) and an Avro-binary body
decoded against the registry schema (``pkg/serializer/serializer.go:50-83``,
``pkg/schemaregistry/schemaregistry.go:80-138``). This container bundles no
Avro library and no spark-avro jar, so the body decode is implemented here
from the Avro 1.11 binary-encoding spec directly — it is ~150 lines because
Debezium envelopes only exercise records/unions/primitives, but the full
primitive + complex type set is covered:

- primitives: null, boolean, int/long (zigzag varint), float, double
  (little-endian IEEE), bytes, string (length-prefixed)
- complex: record, enum, array, map, union (varint branch index), fixed

Logical types decode as their base type (Debezium's epoch codecs are then
normalized by ``functions.temporal`` — P4 — exactly where the reference
does it, in the transformer not the deserializer).

The encoder exists for tests and tools (producing wire-format fixtures);
the hot path only decodes. Both are driver/executor-side plain Python —
the engine calls them inside Arrow-batched ``mapInPandas``, never per-row
through a Python UDF expression.
"""

from __future__ import annotations

import io
import json
import struct

MAGIC_BYTE = b"\x00"


def parse_schema(schema: str | dict | list):
    """Parse an Avro schema (JSON text or already-loaded structure) into the
    dict/list form used by the codec, resolving named-type references."""
    if isinstance(schema, str) and schema.lstrip().startswith(("{", "[", '"')):
        schema = json.loads(schema)
    names: dict[str, dict] = {}

    def walk(s):
        if isinstance(s, str):
            return names.get(s, s)  # primitive name or named-type reference
        if isinstance(s, list):
            return [walk(b) for b in s]
        t = s.get("type")
        if t in ("record", "error"):
            # register before walking fields: supports recursive types
            names[s.get("name")] = s
            s["fields"] = [dict(f, type=walk(f["type"])) for f in s["fields"]]
            return s
        if t in ("enum", "fixed"):
            names[s.get("name")] = s
            return s
        if t == "array":
            return dict(s, items=walk(s["items"]))
        if t == "map":
            return dict(s, values=walk(s["values"]))
        if isinstance(t, (dict, list)):  # {"type": {...}} wrapper
            return walk(t)
        return s

    return walk(schema)


# --- binary decode ----------------------------------------------------------


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise ValueError("avro: truncated input")
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def read_long(self) -> int:
        """Zigzag varint (spec: long/int share the encoding)."""
        shift, acc = 0, 0
        while True:
            b = self.read(1)[0]
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)


def _decode(schema, r: _Reader):
    t = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(schema, list):  # union: varint branch index then value
        return _decode(schema[r.read_long()], r)
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) == b"\x01"
    if t in ("int", "long"):
        return r.read_long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read(r.read_long())
    if t == "string":
        return r.read(r.read_long()).decode("utf-8")
    if t == "record":
        return {f["name"]: _decode(f["type"], r) for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][r.read_long()]
    if t == "fixed":
        return r.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix
                n = -n
                r.read_long()
            out.extend(_decode(schema["items"], r) for _ in range(n))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read(r.read_long()).decode("utf-8")
                out[k] = _decode(schema["values"], r)
        return out
    raise ValueError(f"avro: unsupported schema type {t!r}")


def decode(schema, payload: bytes):
    """Avro binary body → native Python (serializer.go:67 NativeFromBinary)."""
    return _decode(schema, _Reader(payload))


# --- binary encode (tests / fixture production) -----------------------------


def _zigzag(n: int) -> bytes:
    n = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode(schema, obj, w: io.BytesIO):
    t = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(schema, list):  # union: pick the first matching branch
        for i, branch in enumerate(schema):
            bt = branch["type"] if isinstance(branch, dict) else branch
            if (obj is None) == (bt == "null"):
                w.write(_zigzag(i))
                return _encode(branch, obj, w)
        raise ValueError("avro: no union branch matched")
    if t == "null":
        return None
    if t == "boolean":
        return w.write(b"\x01" if obj else b"\x00")
    if t in ("int", "long"):
        return w.write(_zigzag(int(obj)))
    if t == "float":
        return w.write(struct.pack("<f", obj))
    if t == "double":
        return w.write(struct.pack("<d", obj))
    if t == "bytes":
        w.write(_zigzag(len(obj)))
        return w.write(obj)
    if t == "string":
        b = obj.encode("utf-8")
        w.write(_zigzag(len(b)))
        return w.write(b)
    if t == "record":
        for f in schema["fields"]:
            _encode(f["type"], obj.get(f["name"]), w)
        return None
    if t == "enum":
        return w.write(_zigzag(schema["symbols"].index(obj)))
    if t == "fixed":
        return w.write(obj)
    if t == "array":
        if obj:
            w.write(_zigzag(len(obj)))
            for item in obj:
                _encode(schema["items"], item, w)
        return w.write(_zigzag(0))
    if t == "map":
        if obj:
            w.write(_zigzag(len(obj)))
            for k, v in obj.items():
                kb = k.encode("utf-8")
                w.write(_zigzag(len(kb)))
                w.write(kb)
                _encode(schema["values"], v, w)
        return w.write(_zigzag(0))
    raise ValueError(f"avro: unsupported schema type {t!r}")


def encode(schema, obj) -> bytes:
    w = io.BytesIO()
    _encode(schema, obj, w)
    return w.getvalue()


# --- Confluent wire framing -------------------------------------------------


def frame(schema_id: int, body: bytes) -> bytes:
    """magic 0x00 + big-endian u32 schema id + avro body
    (serializer.go:96-112)."""
    return MAGIC_BYTE + schema_id.to_bytes(4, "big") + body


def unframe(value: bytes) -> tuple[int, bytes]:
    """(schema_id, body) from a Confluent-framed message
    (serializer.go:53-67)."""
    if len(value) < 5 or value[0:1] != MAGIC_BYTE:
        raise ValueError("not a Confluent-framed message")
    return int.from_bytes(value[1:5], "big"), value[5:]
