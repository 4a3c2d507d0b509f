"""Avro Object Container File (OCF) source — no spark-avro jar needed.

The reference's transport is Kafka + Schema-Registry-framed Avro
(/root/reference/src/consumer/avro_order_consumer.py:48-63); its FILE
cousin — `.avro` container files — is what a lake ingests.  The
spark-avro connector jar is absent in this container, so this module
implements the public Avro 1.x spec directly (stdlib only):

- **OCF layout** (spec "Object Container Files"): magic ``Obj\\x01``,
  a file-metadata map carrying the writer schema JSON and codec, a
  16-byte sync marker, then blocks of ``(record count, byte size,
  payload, sync)``.  Codecs: ``null`` and ``deflate`` (stdlib zlib,
  raw stream).
- **Generic binary decoder** driven by the embedded writer schema:
  primitives (null/boolean/int/long/float/double/string/bytes),
  records (nested ones land as struct columns), unions (zigzag branch
  index — covers the ubiquitous nullable-field ``["null", T]``),
  arrays and maps (block-counted, with the negative-count/byte-size
  form), enums (symbol index), fixed (raw width bytes), and the
  common logical types (``timestamp-micros``/``timestamp-millis`` ->
  naive-UTC ``timestamp_ntz``, ``date`` -> ``date``).  Named-type
  REFERENCES (reuse of an earlier record/enum/fixed definition by
  name) resolve lazily through a named-type table — which makes
  RECURSIVE schemas (linked lists, trees) decode and encode natively,
  the nesting depth driven by the data.  A recursive value has no
  finite Spark struct type, so recursive-typed FIELDS surface as
  ``string`` columns holding the value's deterministic JSON
  rendering; all other fields keep their native column types.

Scale shape: files are listed and read by ``binaryFile`` (one row per
object, executor-side), block parsing + record decode run in ONE
Arrow-batched ``mapInPandas`` crossing.  Only the SCHEMA is read on
the driver (a few KB from one file's header — the same schema
discovery every file source performs at planning time).  A writer
(``write_avro_ocf``) exists so tests round-trip real container bytes.
"""

from __future__ import annotations

import datetime as _dt
import io
import json
import os
import struct
import zlib
from collections.abc import Iterator

import pandas as pd

_EPOCH_DT = _dt.datetime(1970, 1, 1)
_EPOCH_DATE = _dt.date(1970, 1, 1)


def _naive_utc(value: _dt.datetime) -> _dt.datetime:
    """Aware datetimes convert to UTC then drop the tzinfo; naive ones
    are taken as already-UTC (Spark's session-UTC convention)."""
    if value.tzinfo is not None:
        return value.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return value

MAGIC = b"Obj\x01"
_SYNC = bytes(range(16))  # fixed writer sync marker (any 16 bytes are valid)

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "string", "bytes"}


# --------------------------------------------------------------------------
# varint / zigzag (Avro spec "Binary encoding")
# --------------------------------------------------------------------------

def _write_long(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise ValueError("truncated varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


# --------------------------------------------------------------------------
# schema-driven value codec
# --------------------------------------------------------------------------

def _norm_schema(schema, env: dict | None = None):
    """Normalize the JSON-schema shape: bare strings for primitives,
    dicts for complex types, lists for unions.  With an ``env`` (the
    schema's named-type table from :func:`_build_env`), a string
    naming an earlier record/enum/fixed definition resolves to that
    definition — which is what lets RECURSIVE types decode: the name
    re-resolves lazily at each level instead of expanding forever."""
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return schema
        if env and schema in env:
            return env[schema]
        raise ValueError(f"unsupported named-type reference: {schema!r}")
    return schema


def _names_of_def(s: dict) -> list[str]:
    n = s.get("name")
    if not n:
        return []
    out = [n]
    ns = s.get("namespace")
    if ns and "." not in n:
        out.append(f"{ns}.{n}")
    return out


def _build_env(schema) -> dict:
    """Named-type table for the env-based codec: every record/enum/
    fixed DEFINITION in the schema, keyed by (qualified) name.  A
    record registers BEFORE its fields walk, so self-references —
    recursive schemas — resolve."""
    env: dict[str, dict] = {}

    def walk(s) -> None:
        if isinstance(s, list):
            for b in s:
                walk(b)
        elif isinstance(s, dict):
            t = s["type"]
            if t == "record":
                for n in _names_of_def(s):
                    env[n] = s
                for f in s["fields"]:
                    walk(f["type"])
            elif t in ("enum", "fixed"):
                for n in _names_of_def(s):
                    env[n] = s
            elif t == "array":
                walk(s["items"])
            elif t == "map":
                walk(s["values"])

    walk(schema)
    return env


def _expand_named_refs(schema, recursive_sentinel: bool = False):
    """Expand named-type REFERENCES (a string naming an earlier
    record/enum/fixed definition) into the definition itself, so the
    Spark column mapper walks a self-contained tree.  Spec rule: a
    name must be defined before (reading order) it is referenced — a
    left-to-right walk satisfies exactly that.  RECURSIVE types
    cannot expand to a finite tree: by default they raise; with
    ``recursive_sentinel`` the cycle edge expands to a
    ``{"type": "__recursive__"}`` marker node so the column mapper
    can detect fields on a cycle and map them to JSON string columns
    (the codec itself decodes recursion natively via the lazy
    :func:`_build_env` path and never calls this)."""
    env: dict[str, dict] = {}
    building: set[str] = set()

    def names_of(s) -> list[str]:
        return _names_of_def(s)

    def walk(s):
        if isinstance(s, str):
            if s in _PRIMITIVES:
                return s
            if s in building:
                if recursive_sentinel:
                    return {"type": "__recursive__", "name": s}
                raise ValueError(f"recursive named type {s!r} unsupported")
            if s in env:
                return env[s]
            raise ValueError(f"unsupported named-type reference: {s!r}")
        if isinstance(s, list):
            return [walk(b) for b in s]
        if isinstance(s, dict):
            t = s["type"]
            if t == "record":
                ns = names_of(s)
                building.update(ns)
                out = {**s, "fields": [{**f, "type": walk(f["type"])} for f in s["fields"]]}
                building.difference_update(ns)
                for n in ns:
                    env[n] = out
                return out
            if t in ("enum", "fixed"):
                for n in names_of(s):
                    env[n] = s
                return s
            if t == "array":
                return {**s, "items": walk(s["items"])}
            if t == "map":
                return {**s, "values": walk(s["values"])}
            return s
        return s

    return walk(schema)


def decode_value(schema, buf: io.BytesIO, env: dict | None = None):
    s = _norm_schema(schema, env)
    if isinstance(s, str):
        if s == "null":
            return None
        if s == "boolean":
            return buf.read(1)[0] != 0
        if s in ("int", "long"):
            return _read_long(buf)
        if s == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if s == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if s in ("string", "bytes"):
            raw = buf.read(_read_long(buf))
            return raw.decode("utf-8") if s == "string" else raw
    if isinstance(s, list):  # union: zigzag branch index then value
        return decode_value(s[_read_long(buf)], buf, env)
    if isinstance(s, dict):
        t = s["type"]
        if t == "record":
            return {
                f["name"]: decode_value(f["type"], buf, env) for f in s["fields"]
            }
        if t == "array":
            out = []
            while True:
                count = _read_long(buf)
                if count == 0:
                    return out
                if count < 0:  # negative count -> byte size follows
                    _read_long(buf)
                    count = -count
                out.extend(decode_value(s["items"], buf, env) for _ in range(count))
        if t == "map":  # same block-counted layout, string keys
            m: dict = {}
            while True:
                count = _read_long(buf)
                if count == 0:
                    return m
                if count < 0:
                    _read_long(buf)
                    count = -count
                for _ in range(count):
                    key = buf.read(_read_long(buf)).decode("utf-8")
                    m[key] = decode_value(s["values"], buf, env)
        if t == "enum":  # zigzag symbol index
            return s["symbols"][_read_long(buf)]
        if t == "fixed":  # exactly `size` raw bytes, no length prefix
            return buf.read(s["size"])
        if t in _PRIMITIVES:  # {"type": "long"} wrapper form
            v = decode_value(t, buf)
            lt = s.get("logicalType")
            if v is not None and lt is not None:
                # spec logical types over int/long: naive-UTC datetimes
                # (matches Spark's session-UTC timestamp convention)
                if lt == "timestamp-micros":
                    return _EPOCH_DT + _dt.timedelta(microseconds=v)
                if lt == "timestamp-millis":
                    return _EPOCH_DT + _dt.timedelta(milliseconds=v)
                if lt == "date":
                    return _EPOCH_DATE + _dt.timedelta(days=v)
                if lt == "decimal" and t == "bytes":
                    # big-endian two's-complement unscaled int (spec)
                    import decimal as _decimal

                    unscaled = int.from_bytes(v, "big", signed=True)
                    return _decimal.Decimal(unscaled).scaleb(-s.get("scale", 0))
            return v
        raise ValueError(f"unsupported Avro type: {t!r}")
    raise ValueError(f"bad schema node: {schema!r}")


def encode_value(schema, value, env: dict | None = None) -> bytes:
    s = _norm_schema(schema, env)
    if isinstance(s, str):
        if s == "null":
            return b""
        if s == "boolean":
            return bytes([1 if value else 0])
        if s in ("int", "long"):
            return _write_long(int(value))
        if s == "float":
            return struct.pack("<f", float(value))
        if s == "double":
            return struct.pack("<d", float(value))
        if s == "string":
            raw = str(value).encode("utf-8")
            return _write_long(len(raw)) + raw
        if s == "bytes":
            raw = bytes(value)
            return _write_long(len(raw)) + raw
    if isinstance(s, list):  # union: pick the first matching branch
        for i, branch in enumerate(s):
            bn = _norm_schema(branch, env)
            is_null = bn == "null"
            if (value is None) == is_null:
                return _write_long(i) + encode_value(branch, value, env)
        raise ValueError(f"no union branch for {value!r} in {s!r}")
    if isinstance(s, dict):
        t = s["type"]
        if t == "record":
            return b"".join(
                encode_value(f["type"], value[f["name"]], env) for f in s["fields"]
            )
        if t == "array":
            if not value:
                return _write_long(0)
            return (
                _write_long(len(value))
                + b"".join(encode_value(s["items"], v, env) for v in value)
                + _write_long(0)
            )
        if t == "map":
            if not value:
                return _write_long(0)
            out = bytearray(_write_long(len(value)))
            for mk, mv in value.items():
                kb = str(mk).encode("utf-8")
                out += _write_long(len(kb)) + kb + encode_value(s["values"], mv, env)
            return bytes(out) + _write_long(0)
        if t == "enum":
            try:
                return _write_long(s["symbols"].index(value))
            except ValueError:
                raise ValueError(
                    f"{value!r} not in enum {s.get('name')!r} symbols"
                ) from None
        if t == "fixed":
            raw = bytes(value)
            if len(raw) != s["size"]:
                raise ValueError(
                    f"fixed {s.get('name')!r} needs {s['size']} bytes, got {len(raw)}"
                )
            return raw
        if t in _PRIMITIVES:
            lt = s.get("logicalType")
            if lt == "decimal" and t == "bytes" and not isinstance(value, bytes):
                import decimal as _decimal

                unscaled = int(
                    _decimal.Decimal(value).scaleb(s.get("scale", 0)).to_integral_value()
                )
                n = (unscaled.bit_length() + 8) // 8 or 1
                value = unscaled.to_bytes(n, "big", signed=True)
            elif lt == "timestamp-micros" and isinstance(value, _dt.datetime):
                value = (_naive_utc(value) - _EPOCH_DT) // _dt.timedelta(
                    microseconds=1
                )
            elif lt == "timestamp-millis" and isinstance(value, _dt.datetime):
                value = (_naive_utc(value) - _EPOCH_DT) // _dt.timedelta(
                    milliseconds=1
                )
            elif lt == "date" and isinstance(value, _dt.date):
                value = (value - _EPOCH_DATE).days
            return encode_value(t, value)
        raise ValueError(f"unsupported Avro type: {t!r}")
    raise ValueError(f"bad schema node: {schema!r}")


# --------------------------------------------------------------------------
# container file layout
# --------------------------------------------------------------------------

def ocf_bytes(
    records: list[dict], schema: dict, codec: str = "null",
    records_per_block: int = 1000, extra_meta: dict[str, bytes] | None = None,
) -> bytes:
    """Serialize records to spec-compliant OCF container bytes.

    ``extra_meta`` adds application metadata entries to the header map
    (the spec reserves only the ``avro.`` prefix); the ``kaop_avro``
    writers use it to embed per-part column stats under
    ``kaop.stats``."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    for k, v in (extra_meta or {}).items():
        if k.startswith("avro."):
            raise ValueError(f"extra_meta may not use the reserved avro. prefix: {k!r}")
        meta[k] = v
    out = bytearray(MAGIC)
    out += _write_long(len(meta))
    for k, v in meta.items():
        kk = k.encode()
        out += _write_long(len(kk)) + kk + _write_long(len(v)) + v
    out += _write_long(0)  # end of metadata map
    out += _SYNC
    env = _build_env(schema)  # named refs (incl. recursive) resolve lazily
    for i in range(0, len(records), records_per_block) or [0]:
        block = records[i : i + records_per_block]
        if not block:
            continue
        payload = b"".join(encode_value(schema, r, env) for r in block)
        if codec == "deflate":
            payload = zlib.compress(payload)[2:-4]  # raw deflate per spec
        out += _write_long(len(block)) + _write_long(len(payload)) + payload + _SYNC
    return bytes(out)


def write_avro_ocf(
    path: str, records: list[dict], schema: dict, codec: str = "null",
    records_per_block: int = 1000, extra_meta: dict[str, bytes] | None = None,
) -> None:
    """Write a spec-compliant OCF (test/fixture writer; driver-side).
    Accepts pyarrow-filesystem URIs as well as local paths."""
    data = ocf_bytes(records, schema, codec, records_per_block, extra_meta)
    if "://" in path:
        import pyarrow.fs as pafs

        fs, rel = pafs.FileSystem.from_uri(path)
        parent = rel.rsplit("/", 1)[0] if "/" in rel else ""
        if parent:
            fs.create_dir(parent, recursive=True)
        with fs.open_output_stream(rel) as f:
            f.write(data)
        return
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)


def parse_ocf(payload: bytes) -> tuple[dict, list[dict]]:
    """Parse one container file: (writer schema, records)."""
    buf = io.BytesIO(payload)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:  # negative block count form
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = buf.read(_read_long(buf)).decode()
            meta[k] = buf.read(_read_long(buf))
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    env = _build_env(schema)  # named refs (incl. recursive) resolve lazily
    sync = buf.read(16)
    records: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        count = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        bbuf = io.BytesIO(block)
        records.extend(decode_value(schema, bbuf, env) for _ in range(count))
    return schema, records


def parse_ocf_meta(payload: bytes) -> dict[str, bytes]:
    """The header metadata map of a container file, from a byte PREFIX
    — no block decode, so a small ranged read suffices.  Raises on any
    truncation (including a prefix that ends inside the map or before
    the sync marker), letting callers fall back to a full read."""
    buf = io.BytesIO(payload)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:  # negative block count form
            _read_long(buf)
            n = -n
        for _ in range(n):
            klen = _read_long(buf)
            k = buf.read(klen)
            vlen = _read_long(buf)
            v = buf.read(vlen)
            if len(k) != klen or len(v) != vlen:
                raise ValueError("truncated OCF header")
            meta[k.decode()] = v
    if len(buf.read(16)) != 16:  # sync marker must be fully present
        raise ValueError("truncated OCF header")
    return meta


#: header metadata key under which the writers embed per-part column
#: stats (the spec reserves only the ``avro.`` prefix for itself)
STATS_META_KEY = "kaop.stats"


_BLOOM_K = 7              # hash probes per key (Kirsch-Mitzenmacher)
_BLOOM_BITS_PER_KEY = 10  # ~1% fpp at k=7
_BLOOM_MAX_BITS = 1 << 16  # 8 KB raw per column per part, hard cap


def _bloom_hashes(canon: str) -> tuple[int, int]:
    """Two 64-bit hash seeds from the canonical value string; all k
    probe positions derive as h1 + i*h2 (Kirsch-Mitzenmacher).  md5 so
    the writer and any independent reader implementation agree."""
    import hashlib

    d = hashlib.md5(canon.encode()).digest()
    return int.from_bytes(d[:8], "big"), int.from_bytes(d[8:], "big") | 1


def _bloom_build(values, bits_per_key: int = _BLOOM_BITS_PER_KEY) -> dict | None:
    """A per-part bloom filter over a column's distinct non-null
    values, JSON-serializable: ``{"t": "i"|"s", "m": bits, "k": n,
    "b64": bitset}``.  Only single-typed int or str columns qualify
    (floats have no canonical equality representation, bools are
    pointless); anything else returns None and equality pruning stays
    min/max-only for the column.  ``bits_per_key`` sizes the bitset
    (default 10 ≈ 1% fpp at k=7; raise it for lower false-positive
    rates — fewer wasted part opens — at the cost of larger
    stats/manifest entries; the 8 KB per-column hard cap still
    applies, so very-high-cardinality parts saturate and the filter
    degrades gracefully toward keep-everything, never wrong)."""
    import base64

    vals = [v for v in values if v is not None]
    if not vals:
        return None
    if all(isinstance(v, int) and not isinstance(v, bool) for v in vals):
        t = "i"
    elif all(isinstance(v, str) for v in vals):
        t = "s"
    else:
        return None
    canon = {str(v) for v in vals}
    m = 64
    while m < len(canon) * bits_per_key and m < _BLOOM_MAX_BITS:
        m <<= 1
    bits = bytearray(m // 8)
    for s in canon:
        h1, h2 = _bloom_hashes(s)
        for i in range(_BLOOM_K):
            pos = (h1 + i * h2) % m
            bits[pos >> 3] |= 1 << (pos & 7)
    return {"t": t, "m": m, "k": _BLOOM_K,
            "b64": base64.b64encode(bytes(bits)).decode()}


def _bloom_may_contain(bloom: dict, value) -> bool:
    """Membership probe; True (keep) whenever the probe cannot be
    trusted — type mismatch between the filter literal and the values
    the bloom was built over means the canonical strings would not be
    comparable, so no pruning."""
    import base64

    if bloom["t"] == "i":
        if not isinstance(value, int) or isinstance(value, bool):
            return True
    elif not isinstance(value, str):
        return True
    m, k = bloom["m"], bloom["k"]
    bits = base64.b64decode(bloom["b64"])
    h1, h2 = _bloom_hashes(str(value))
    return all(
        bits[pos >> 3] & (1 << (pos & 7))
        for pos in ((h1 + i * h2) % m for i in range(k))
    )


def collect_stats(
    records: list[dict], names, bloom_cols=frozenset(),
    bloom_bits_per_key: int = _BLOOM_BITS_PER_KEY,
) -> dict:
    """Per-part column stats for stats-based file skipping:
    ``{"rows": N, "cols": {name: {"nulls": K[, "min": lo, "max": hi]}}}``.

    ``min``/``max`` are present only when every non-null value of the
    column is an orderable primitive (int/float/str — not bool, not
    NaN, not bytes/struct/array/datetime): a column any of whose
    values cannot safely order keeps just its null count, and file
    skipping stays conservative for it.  NaN is excluded outright
    because Spark orders NaN LARGER than any float while Python
    comparisons with NaN are all false — a NaN-contaminated max would
    wrongly prune files.

    Columns named in ``bloom_cols`` additionally get a per-part bloom
    filter over their distinct values (``bloom`` sub-entry) — the
    point-lookup complement to min/max: an equality probe into a
    hash-distributed lake, where every part spans nearly the full key
    range, prunes by bloom even though no range test can."""
    cols: dict[str, dict] = {}
    for n in names:
        nulls, lo, hi, orderable = 0, None, None, True
        for r in records:
            v = r.get(n)
            if v is None:
                nulls += 1
            elif (
                orderable
                and isinstance(v, (int, float, str))
                and not isinstance(v, bool)
                and v == v  # excludes float NaN
            ):
                if lo is None:
                    lo = hi = v
                else:
                    try:
                        if v < lo:
                            lo = v
                        if v > hi:
                            hi = v
                    except TypeError:
                        orderable, lo, hi = False, None, None
            else:
                orderable, lo, hi = False, None, None
        ent: dict = {"nulls": nulls}
        if orderable and lo is not None:
            ent["min"], ent["max"] = lo, hi
        if n in bloom_cols:
            bloom = _bloom_build([r.get(n) for r in records], bloom_bits_per_key)
            if bloom is not None:
                ent["bloom"] = bloom
        cols[n] = ent
    return {"rows": len(records), "cols": cols}


def _stats_meta(records: list[dict], names) -> dict[str, bytes]:
    return {STATS_META_KEY: json.dumps(collect_stats(records, names), sort_keys=True).encode()}


# --------------------------------------------------------------------------
# schema resolution (Avro spec "Schema Resolution" — the evolution subset
# a lake actually leans on)
# --------------------------------------------------------------------------

#: legal numeric promotions writer -> reader (spec table)
_PROMOTIONS = {
    ("int", "long"), ("int", "float"), ("int", "double"),
    ("long", "float"), ("long", "double"), ("float", "double"),
}


def _type_kind(schema) -> str:
    """The type-kind name used for resolution matching: primitive name,
    ``"union"`` for lists, the ``type`` attribute for complex nodes."""
    s = _norm_schema(schema)
    if isinstance(s, str):
        return s
    if isinstance(s, list):
        return "union"
    return s["type"]


def _value_matches(v, schema) -> bool:
    """Does a DECODED Python value conform to this (normalized) Avro
    node?  Used to re-match a writer-union value to the branch the
    writer chose — the branch index is consumed at decode time, but
    the decoded value's shape identifies it (mirrors ``encode_value``'s
    first-match rule, so the re-match is symmetric with the writer)."""
    s = _norm_schema(schema)
    if isinstance(s, list):
        return any(_value_matches(v, b) for b in s)
    if s == "null" or (isinstance(s, dict) and s["type"] == "null"):
        return v is None
    if v is None:
        return False
    if isinstance(s, str):
        if s == "boolean":
            return isinstance(v, bool)
        if s in ("int", "long"):
            return isinstance(v, int) and not isinstance(v, bool)
        if s in ("float", "double"):
            return isinstance(v, float)
        if s == "string":
            return isinstance(v, str)
        if s == "bytes":
            return isinstance(v, bytes)
        return False
    t, lt = s["type"], s.get("logicalType")
    if lt in ("timestamp-micros", "timestamp-millis"):
        return isinstance(v, _dt.datetime)
    if lt == "date":
        return isinstance(v, _dt.date) and not isinstance(v, _dt.datetime)
    if lt == "decimal" and t == "bytes":
        import decimal as _decimal

        return isinstance(v, (_decimal.Decimal, bytes))
    if t == "record":
        return isinstance(v, dict) and set(v) >= {f["name"] for f in s["fields"]}
    if t == "map":
        return isinstance(v, dict)
    if t == "array":
        return isinstance(v, list)
    if t == "enum":
        return isinstance(v, str) and v in s["symbols"]
    if t == "fixed":
        return isinstance(v, bytes) and len(v) == s["size"]
    if t in _PRIMITIVES:
        return _value_matches(v, t)
    return False


def _branch_compatible(writer_type, reader_branch) -> bool:
    """Can this (non-union) writer type resolve against this reader
    union branch?  Spec: the FIRST reader branch that matches is
    recursively resolved against — match means same type-kind or a
    legal promotion (numeric table plus string<->bytes)."""
    rb = _norm_schema(reader_branch)
    if isinstance(rb, list):  # unions never directly nest in Avro
        return False
    wk, rk = _type_kind(writer_type), _type_kind(rb)
    if wk == rk:
        return True
    return (wk, rk) in _PROMOTIONS or (wk, rk) in (
        ("string", "bytes"), ("bytes", "string"),
    )


def _resolve_value(v, writer_type, reader_type, field: str = ""):
    """Resolve one decoded value against the reader's type per the
    spec's Schema Resolution rules — full union re-resolution:

    - writer union: the value re-matches to the branch the writer
      chose, then that branch resolves against the reader type (so
      branch-subset/superset/reordered unions all work; an error
      surfaces only for a datum whose actual branch the reader
      dropped — exactly the spec's per-datum semantics);
    - reader union (writer branch not a union): the first reader
      branch the writer type matches is resolved against; no match —
      including a null from a nullable writer meeting a reader with
      no null branch — is an error, never a silent pass-through;
    - both non-union: equal kinds pass through (records/arrays/maps
      recurse, so nested evolution works; enum symbols must exist in
      the reader's symbol set or its spec ``default``; fixed must
      agree on size), numeric promotions and string<->bytes convert,
      anything else raises ``illegal promotion``."""
    ws, rs = _norm_schema(writer_type), _norm_schema(reader_type)
    if isinstance(ws, list):
        branch = next((b for b in ws if _value_matches(v, b)), None)
        if branch is None:
            raise ValueError(
                f"value {v!r} matches no writer union branch for {field!r}"
            )
        return _resolve_value(v, branch, rs, field)
    if isinstance(rs, list):
        for rb in rs:
            if _branch_compatible(ws, rb):
                return _resolve_value(v, ws, rb, field)
        rnames = "|".join(_type_kind(b) for b in rs)
        raise ValueError(
            f"illegal promotion {_type_kind(ws)} -> union[{rnames}] for {field!r}"
        )
    wk, rk = _type_kind(ws), _type_kind(rs)
    if wk == rk:
        if wk == "record":
            return resolve_record(v, ws, rs)
        if wk == "array":
            return [
                _resolve_value(x, ws["items"], rs["items"], field) for x in v
            ]
        if wk == "map":
            return {
                mk: _resolve_value(mv, ws["values"], rs["values"], field)
                for mk, mv in v.items()
            }
        if wk == "enum":
            if v in rs["symbols"]:
                return v
            if "default" in rs:  # spec enum default for unknown symbols
                return rs["default"]
            raise ValueError(
                f"enum symbol {v!r} absent from reader symbols for {field!r}"
            )
        if wk == "fixed":
            if rs["size"] != len(v):
                raise ValueError(
                    f"fixed size mismatch {len(v)} -> {rs['size']} for {field!r}"
                )
            return v
        return v
    if v is None:  # nullable writer value meeting a promotable reader
        raise ValueError(f"illegal promotion null -> {rk} for {field!r}")
    if (wk, rk) in _PROMOTIONS:
        return float(v) if rk in ("float", "double") else int(v)
    if (wk, rk) == ("string", "bytes"):
        return v.encode("utf-8")
    if (wk, rk) == ("bytes", "string"):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError as e:
            raise ValueError(
                f"bytes -> string promotion for {field!r}: not valid UTF-8 ({e})"
            ) from None
    raise ValueError(f"illegal promotion {wk} -> {rk} for {field!r}")


def resolve_record(writer_rec: dict, writer_schema: dict, reader_schema: dict) -> dict:
    """Project one decoded writer record onto the reader schema:

    - reader fields present in the writer resolve via
      :func:`_resolve_value` — full spec resolution including numeric
      and string<->bytes promotion, UNION re-resolution (writer and
      reader unions with different branch sets, matched per the spec's
      first-match rule), and recursion into nested records, arrays
      and maps;
    - reader fields ABSENT from the writer take their ``default``
      (required by the spec — missing default raises);
    - a reader field may RENAME a writer field by listing the old
      name in its ``aliases`` (spec field-alias matching; first
      matching alias wins);
    - writer fields the reader dropped are discarded.

    The only remaining resolution exclusion: a ``reader_schema``
    whose fields reference RECURSIVE named types (the codec
    reads/writes recursion natively, but evolving a recursive type
    through per-record resolution raises by name rather than guess)."""
    writer_fields = {f["name"]: f for f in writer_schema["fields"]}
    out = {}
    for rf in reader_schema["fields"]:
        name = rf["name"]
        src = name if name in writer_fields else next(
            (a for a in rf.get("aliases", ()) if a in writer_fields), None
        )
        if src is not None:
            out[name] = _resolve_value(
                writer_rec[src], writer_fields[src]["type"], rf["type"], name
            )
        elif "default" in rf:
            out[name] = rf["default"]
        else:
            raise ValueError(f"reader field {name!r} absent in writer and has no default")
    return out


# --------------------------------------------------------------------------
# Spark integration
# --------------------------------------------------------------------------

_AVRO_TO_SPARK = {
    "boolean": "boolean", "int": "int", "long": "long",
    "float": "float", "double": "double", "string": "string", "bytes": "binary",
}


def _spark_field_type(schema) -> str:
    s = _norm_schema(schema)
    if isinstance(s, str):
        if s in _AVRO_TO_SPARK:
            return _AVRO_TO_SPARK[s]
        raise ValueError(f"cannot map Avro type {s!r} to a Spark column")
    if isinstance(s, list):  # nullable union -> the non-null branch's type
        non_null = [b for b in s if _norm_schema(b) != "null"]
        if len(non_null) != 1:
            raise ValueError(f"only nullable unions map to columns: {s!r}")
        return _spark_field_type(non_null[0])
    if isinstance(s, dict):
        t = s["type"]
        if t == "array":
            return f"array<{_spark_field_type(s['items'])}>"
        if t == "map":  # Avro map keys are always strings
            return f"map<string,{_spark_field_type(s['values'])}>"
        if t == "enum":  # symbols land as their string names
            return "string"
        if t == "fixed":  # width-checked at codec level, binary column
            return "binary"
        if t == "record":  # nested record -> struct column
            inner = ", ".join(
                f"{f['name']}: {_spark_field_type(f['type'])}" for f in s["fields"]
            )
            return f"struct<{inner}>"
        lt = s.get("logicalType")
        if lt in ("timestamp-micros", "timestamp-millis"):
            return "timestamp_ntz"  # codec yields naive-UTC datetimes
        if lt == "date":
            return "date"
        if lt == "decimal" and t == "bytes":
            return f"decimal({s.get('precision', 38)},{s.get('scale', 0)})"
        if t in _AVRO_TO_SPARK:
            return _AVRO_TO_SPARK[t]
    raise ValueError(f"cannot map Avro schema node {schema!r}")


def _contains_recursive(s) -> bool:
    if isinstance(s, list):
        return any(_contains_recursive(b) for b in s)
    if isinstance(s, dict):
        t = s.get("type")
        if t == "__recursive__":
            return True
        if t == "record":
            return any(_contains_recursive(f["type"]) for f in s["fields"])
        if t == "array":
            return _contains_recursive(s["items"])
        if t == "map":
            return _contains_recursive(s["values"])
    return False


def _json_default(o):
    if isinstance(o, bytes):
        return o.hex()
    if hasattr(o, "isoformat"):
        return o.isoformat()
    return str(o)


def _to_json_cell(v):
    return None if v is None else json.dumps(
        v, sort_keys=True, default=_json_default
    )


def _spark_fields_of(schema) -> list[tuple[str, str, bool]]:
    """``(name, spark_type, is_json)`` per top-level record field.
    A field whose type participates in a named-type CYCLE (recursive
    schema — linked lists, trees) has no finite struct representation,
    so it lands as a ``string`` column holding the decoded value's
    deterministic JSON rendering; every other field maps to its native
    Spark type as before."""
    expanded = _expand_named_refs(schema, recursive_sentinel=True)
    out = []
    for f in expanded["fields"]:
        if _contains_recursive(f["type"]):
            out.append((f["name"], "string", True))
        else:
            out.append((f["name"], _spark_field_type(f["type"]), False))
    return out


def read_avro_ocf(
    spark,
    path: str,
    reader_schema: dict | None = None,
    version: int | None = None,
):
    """``spark.read`` for `.avro` container files without the jar.

    The writer schema comes from ONE file's header (driver-side, a few
    KB — the planning-time schema discovery every source does); the
    files themselves stream through binaryFile + one Arrow-batched
    mapInPandas that parses blocks and decodes records executor-side.
    Top-level schema must be a record of mappable fields.

    With ``reader_schema`` the source performs Avro schema RESOLUTION
    per record (``resolve_record``): files written under EVOLVED
    writer schemas read as one table — new reader fields fill from
    defaults, dropped fields are discarded, numeric promotions apply.
    Without it, every file must match the discovered schema exactly
    (drift is an error, not a silent coercion).

    Listing goes through ``_list_avro`` — the same manifest-aware,
    ``_tmp_``-filtering path the ``kaop_avro`` reader uses — so on a
    manifest-managed (URI-written) directory this function sees the
    COMMITTED part set, never uncommitted or aborted final-named
    parts, and the two batch read paths always agree.

    ``version`` time-travels a manifest-managed directory: the part
    set comes from that commit's immutable snapshot
    (``_manifest.v{N}.json``, written by every successful publish)
    instead of the current manifest.  Absent snapshot -> loud
    ValueError; snapshot present but parts vacuumed -> the decode
    fails at read, the Delta-style "vacuum bounds time travel"
    contract (see ``vacuum_avro_dir``'s retention).
    """
    if version is not None and path.endswith(".avro"):
        raise ValueError("version= applies to directories, not single files")
    files = [path] if path.endswith(".avro") else _list_avro(path, version)
    if not files:
        # empty manifest-managed table (e.g. after a full DELETE):
        # return an empty frame — shaped by the reader schema when one
        # was passed, else by the manifest's recorded writer schema
        if reader_schema is not None:
            fields = _spark_fields_of(reader_schema)
        else:
            _, fields = _schema_of_dir(path, version)  # raises if unknown
        out_schema = ", ".join(f"{n} {t}" for n, t, _ in fields)
        return spark.createDataFrame([], out_schema)
    return _read_avro_files(spark, files, reader_schema)


def _read_avro_files(spark, files: list[str], reader_schema: dict | None = None):
    """The distributed decode over an EXPLICIT file list —
    ``read_avro_ocf``'s engine, also used by maintenance operations
    (targeted delete) that must scan only the parts they will
    rewrite."""
    if not files:
        raise ValueError("no .avro files to read")
    if reader_schema is None:
        schema, _ = parse_ocf(_read_bytes(files[0]))
        if _norm_schema(schema).get("type") != "record":
            raise ValueError("top-level OCF schema must be a record")
        fields = _spark_fields_of(schema)
    else:
        schema = None
        fields = _spark_fields_of(reader_schema)
    out_schema = ", ".join(f"{n} {t}" for n, t, _ in fields)
    names = [n for n, _, _ in fields]
    json_fields = {n for n, _, is_json in fields if is_json}
    listing = spark.createDataFrame(
        [(f,) for f in files], "path string"
    ).repartition(len(files))  # one executor task per container file

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for fpath in pdf["path"]:
                fschema, recs = parse_ocf(_read_bytes(fpath))
                if reader_schema is not None:
                    recs = [resolve_record(r, fschema, reader_schema) for r in recs]
                elif fschema != schema:
                    raise ValueError("schema drift across .avro files")
                if json_fields:  # recursive-typed fields -> JSON cells
                    recs = [
                        {**r, **{n: _to_json_cell(r[n]) for n in json_fields}}
                        for r in recs
                    ]
                rows.extend(recs)
            yield pd.DataFrame(rows, columns=names)

    return listing.mapInPandas(_decode, schema=out_schema)


# --------------------------------------------------------------------------
# custom DataSource: spark.read/readStream.format("kaop_avro")
# --------------------------------------------------------------------------

try:  # pyspark>=4 only
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        DataSourceStreamWriter,
        DataSourceWriter,
        InputPartition,
        WriterCommitMessage,
    )
except ImportError:  # pragma: no cover
    DataSource = DataSourceReader = object  # type: ignore[assignment,misc]
    DataSourceWriter = DataSourceStreamWriter = object  # type: ignore[assignment,misc]
    DataSourceStreamReader = object  # type: ignore[assignment,misc]
    InputPartition = WriterCommitMessage = None  # type: ignore[assignment]

try:  # pyspark>=4.1 only — the Python DataSource filter-pushdown API
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        IsNotNull,
        IsNull,
        LessThan,
        LessThanOrEqual,
        Not,
        StringStartsWith,
    )

    _HAS_PUSHDOWN = True
except ImportError:  # pragma: no cover
    _HAS_PUSHDOWN = False


def _manifest_at(path: str, version: int) -> dict:
    """The immutable snapshot manifest for `version`, or a loud error:
    absence means the version never committed, predates snapshots, or
    its snapshot was vacuumed past the retention window."""
    sp = _snapshot_path(path, version)
    try:
        raw = _read_bytes(sp)
    except (FileNotFoundError, OSError) as e:
        raise ValueError(
            f"version {version} of {path!r} is not readable: no snapshot "
            "manifest (never committed, written before snapshots existed, "
            "or vacuumed past the retention window)"
        ) from e
    return json.loads(raw)


def manifest_history(path: str) -> list[dict]:
    """The retained commit history of a manifest-managed directory:
    one dict per surviving snapshot, version-ascending —
    (version, n_parts, parts).  Time travel is BOUNDED BY VACUUM: a
    version whose parts were vacuumed lists here until its snapshot
    ages out, but reading it fails at decode (the Delta-style
    contract: vacuum trades history for space)."""
    base = path.rstrip("/")
    names: list[str]
    if "://" in base:
        import pyarrow.fs as pafs

        fs, rel = pafs.FileSystem.from_uri(base)
        sel = pafs.FileSelector(rel, allow_not_found=True)
        names = [
            fi.base_name
            for fi in fs.get_file_info(sel)
            if fi.is_file
            and fi.base_name.startswith("_manifest.v")
            and fi.base_name.endswith(".json")
        ]
    else:
        import glob as _glob

        names = [
            os.path.basename(f)
            for f in _glob.glob(os.path.join(base, "_manifest.v*.json"))
        ]
    out = []
    for n in sorted(names):
        v = int(n[len("_manifest.v"):-len(".json")])
        m = _manifest_at(path, v)
        parts = sorted(m.get("parts", []))
        out.append({"version": v, "n_parts": len(parts), "parts": parts})
    return out


def diff_versions(path: str, v_from: int, v_to: int) -> dict:
    """Part-level diff between two retained commits of a
    manifest-managed directory — the 'what changed between yesterday's
    table and today's?' audit a lakehouse operator runs before blaming
    a downstream job.

    Returns {v_from, v_to, parts_added, parts_removed, parts_kept,
    rows_added, rows_removed, rows_from, rows_to, row_delta}: the part
    name lists plus exact row totals from the snapshots' own per-part
    stats (each row figure is None when any involved part predates
    stats collection — absence is reported, never guessed).  Reads two
    snapshot JSONs; no data files are touched, so the diff costs the
    same for a 10-part table and a 10⁶-part one.  Raises like
    :func:`read_avro_ocf` (version=...) when either snapshot is gone
    (vacuum trades history for space)."""
    a = _manifest_at(path, int(v_from))
    b = _manifest_at(path, int(v_to))
    pa, pb = set(a.get("parts", [])), set(b.get("parts", []))
    added, removed = sorted(pb - pa), sorted(pa - pb)
    kept = sorted(pa & pb)
    sa, sb = a.get("stats", {}) or {}, b.get("stats", {}) or {}

    def _rows(stats: dict, names) -> int | None:
        vals = [(stats.get(n) or {}).get("rows") for n in names]
        return None if any(v is None for v in vals) else sum(vals)

    rows_from = _rows(sa, sorted(pa))
    rows_to = _rows(sb, sorted(pb))
    return {
        "v_from": int(v_from),
        "v_to": int(v_to),
        "parts_added": added,
        "parts_removed": removed,
        "parts_kept": kept,
        "rows_added": _rows(sb, added),
        "rows_removed": _rows(sa, removed),
        "rows_from": rows_from,
        "rows_to": rows_to,
        "row_delta": (
            rows_to - rows_from
            if rows_from is not None and rows_to is not None
            else None
        ),
    }


def _list_avro(path: str, version: int | None = None) -> list[str]:
    if version is not None:
        base = path.rstrip("/")
        m = _manifest_at(path, version)
        return [f"{base}/{p}" for p in sorted(m.get("parts", []))]
    # Manifest-managed directories (URI-mode writes) read the COMMITTED
    # part set, never the raw listing — that is what makes the
    # no-rename object-store commit safe.
    m = _read_manifest(path)
    if m is not None:
        base = path.rstrip("/")
        return [f"{base}/{p}" for p in sorted(m.get("parts", []))]
    # _tmp_* are in-flight writer files — never visible to readers (or
    # to an overwrite's delete pass) until commit renames them.
    # URI paths (file://, s3://, hdfs://, ...) list through pyarrow's
    # filesystem layer so the source is not local-glob-only; plain
    # paths stay on the cheap stdlib glob.
    if "://" in path:
        import pyarrow.fs as pafs

        fs, rel = pafs.FileSystem.from_uri(path)
        scheme = path.split("://", 1)[0]
        sel = pafs.FileSelector(rel, allow_not_found=True)
        return sorted(
            f"{scheme}://{fi.path}"
            for fi in fs.get_file_info(sel)
            if fi.is_file
            and fi.path.endswith(".avro")
            and not fi.base_name.startswith("_tmp_")
        )
    import glob as _glob

    return sorted(
        f
        for f in _glob.glob(os.path.join(path, "*.avro"))
        if not os.path.basename(f).startswith("_tmp_")
    )


def _read_bytes(path: str) -> bytes:
    """Whole-file read through pyarrow's fs for URI paths (runs in the
    executor task that owns the file's partition), stdlib otherwise."""
    if "://" in path:
        import pyarrow.fs as pafs

        fs, rel = pafs.FileSystem.from_uri(path)
        with fs.open_input_file(rel) as f:
            return f.read()
    with open(path, "rb") as f:
        return f.read()


_HEADER_PROBE_BYTES = 1 << 16


def _read_prefix(path: str, n: int) -> bytes:
    """First ``n`` bytes of a file (ranged read — what a header probe
    costs on an object store, not a whole-object GET)."""
    if "://" in path:
        import pyarrow.fs as pafs

        fs, rel = pafs.FileSystem.from_uri(path)
        with fs.open_input_stream(rel) as f:
            return f.read(n)
    with open(path, "rb") as f:
        return f.read(n)


def _header_stats(path: str) -> dict | None:
    """The ``kaop.stats`` entry of one part's header, or None when the
    part predates stats / was written by another tool (file skipping
    then keeps the file — conservative).  A header larger than the
    probe window falls back to one full read."""
    try:
        meta = parse_ocf_meta(_read_prefix(path, _HEADER_PROBE_BYTES))
    except (ValueError, OSError):
        try:
            meta = parse_ocf_meta(_read_bytes(path))
        except (ValueError, OSError):
            return None
    raw = meta.get(STATS_META_KEY)
    try:
        return json.loads(raw) if raw else None
    except ValueError:
        return None


def _delete_file(path: str) -> None:
    if "://" in path:
        import pyarrow.fs as pafs

        fs, rel = pafs.FileSystem.from_uri(path)
        fs.delete_file(rel)
        return
    os.remove(path)


def _move_file(src: str, dst: str) -> None:
    """Move within one filesystem (cleanSource=archive).  URI paths go
    through pyarrow's fs; local paths use an os.replace after creating
    the destination directory."""
    if "://" in src:
        import pyarrow.fs as pafs

        fs, rel_src = pafs.FileSystem.from_uri(src)
        _, rel_dst = pafs.FileSystem.from_uri(dst)
        parent = rel_dst.rsplit("/", 1)[0] if "/" in rel_dst else ""
        if parent:
            fs.create_dir(parent, recursive=True)
        fs.move(rel_src, rel_dst)
        return
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    os.replace(src, dst)


# --------------------------------------------------------------------------
# manifest commit protocol (URI/object-store writes)
#
# Object stores have no atomic rename, so the local temp-then-rename
# commit cannot work there.  Instead URI-mode writes use the standard
# manifest pattern: tasks write final uniquely-named parts directly
# (invisible — readers of a manifest-managed directory read the
# manifest, not the listing), and the driver's commit publishes them
# with ONE small-object PUT of ``_manifest.json`` (atomic per object).
# The writer seeds the manifest from the current listing before the
# job, so externally-produced parts fold in and in-flight parts never
# leak through the listing fallback.
#
# Concurrent writers: plain object stores have no compare-and-swap,
# so the read-modify-write of the manifest can race.  ``_publish_
# manifest`` closes the common window: every publish re-reads the
# manifest, applies its mutation to the CURRENT state (so an append
# folds in parts another writer committed meanwhile — part names are
# per-job unique, unions are safe), stamps a version + a one-shot
# writer token, PUTs, then READS BACK; if another writer's PUT won
# the race the token mismatch is detected and the merge retries
# against the new state, and after bounded retries it raises instead
# of silently dropping the other writer's parts.
#
# On LOCAL filesystems (plain paths and file:// URIs) the publish
# additionally runs under a real O_EXCL lock file (_manifest_lock),
# which POSIX guarantees atomic — cooperating writers on one mount
# are truly serialized, with mtime-expiry repair for crashed holders.
# For OBJECT stores no such primitive exists, so there the protocol
# is detect-and-repair, not true CAS — a store that reorders or
# delays read-after-write visibility can still interleave two PUTs
# undetected, and heavy multi-writer workloads should serialize
# commits externally; what can no longer happen silently is the
# last-writer-wins part loss.
# --------------------------------------------------------------------------

MANIFEST = "_manifest.json"
_SNAPSHOT_FMT = "_manifest.v{version:012d}.json"


def _manifest_path(path: str) -> str:
    return path.rstrip("/") + "/" + MANIFEST


def _snapshot_path(path: str, version: int) -> str:
    return path.rstrip("/") + "/" + _SNAPSHOT_FMT.format(version=int(version))


def _read_manifest(path: str) -> dict | None:
    """The committed manifest, or None ONLY when it is genuinely
    absent (the directory is not manifest-managed).  Any other
    failure — IO/permission/network, or corrupt JSON — raises: a
    silent fallback to the raw listing on a flaky read would surface
    uncommitted final-named parts, violating the commit protocol's
    visibility invariant."""
    mp = _manifest_path(path)
    if "://" not in mp and not os.path.exists(mp):
        return None
    try:
        raw = _read_bytes(mp)
    except FileNotFoundError:
        return None
    return json.loads(raw)


def _write_bytes_generic(full_path: str, data: bytes) -> None:
    if "://" in full_path:
        import pyarrow.fs as pafs

        fs, rel = pafs.FileSystem.from_uri(full_path)
        with fs.open_output_stream(rel) as f:
            f.write(data)
        return
    with open(full_path, "wb") as f:
        f.write(data)


def _write_manifest(path: str, manifest: dict) -> None:
    _write_bytes_generic(
        _manifest_path(path), json.dumps(manifest, sort_keys=True).encode()
    )


def _local_lock_path(path: str) -> str | None:
    """Lock-file path when the manifest lives on a filesystem with an
    atomic exclusive create (plain local paths and file:// URIs);
    None for object stores, which have no primitive to build a real
    mutex from."""
    mp = _manifest_path(path)
    if "://" not in mp:
        return mp + ".lock"
    if mp.startswith("file://"):
        return mp[len("file://"):] + ".lock"
    return None


class _manifest_lock:
    """True mutual exclusion for local-filesystem manifest commits via
    O_CREAT|O_EXCL (POSIX-atomic even over NFSv3+).  A crashed holder
    is repaired by mtime expiry: a lock older than `stale_after` is
    broken and re-contended.  Object-store paths yield without locking
    — there the versioned read-back protocol below remains the only
    (detect-and-repair) guard, as the module comment documents."""

    def __init__(self, path: str, timeout: float = 30.0,
                 stale_after: float = 120.0):
        self.lock_path = _local_lock_path(path)
        self.timeout = timeout
        self.stale_after = stale_after

    def __enter__(self):
        if self.lock_path is None:
            return False
        import random as _random
        import time as _time

        deadline = _time.monotonic() + self.timeout
        while True:
            try:
                fd = os.open(
                    self.lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY
                )
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                return True
            except FileExistsError:
                try:
                    age = _time.time() - os.path.getmtime(self.lock_path)
                except OSError:
                    continue  # holder released between open and stat
                if age > self.stale_after:
                    # crashed holder: break the lock; the O_EXCL retry
                    # decides the winner among simultaneous breakers
                    try:
                        os.unlink(self.lock_path)
                    except FileNotFoundError:
                        pass
                    continue
                if _time.monotonic() > deadline:
                    raise RuntimeError(
                        f"manifest lock {self.lock_path!r} held for over "
                        f"{self.timeout}s by a live writer; serialize "
                        f"commits or raise the timeout"
                    )
                _time.sleep(0.005 + _random.random() * 0.02)

    def __exit__(self, *exc):
        if self.lock_path is not None:
            try:
                os.unlink(self.lock_path)
            except FileNotFoundError:
                pass
        return False


def _publish_manifest(path: str, mutate, max_retries: int = 5) -> dict:
    """Versioned read-mutate-write of the manifest with lost-race
    detection (see the protocol comment above).  ``mutate(current)``
    returns the new manifest body computed from the CURRENT committed
    state — it is re-invoked on every retry so concurrent commits
    fold in rather than being overwritten.

    On local filesystems the read-modify-write additionally runs under
    a real O_EXCL lock (``_manifest_lock``), so cooperating writers on
    one mount are serialized outright — the read-back check then only
    guards against NON-cooperating writers (processes mutating the
    manifest without taking the lock).  On object stores the lock is a
    no-op and detect-and-repair is the whole story."""
    import uuid as _uuid

    last_seen = None
    with _manifest_lock(path):
        for _ in range(max_retries):
            cur = _read_manifest(path) or {}
            new = mutate(dict(cur))
            new["version"] = int(cur.get("version", 0)) + 1
            new["writer"] = _uuid.uuid4().hex  # one-shot token: detects lost PUT races
            _write_manifest(path, new)
            check = _read_manifest(path)
            if check == new:
                # Immutable per-version snapshot — the time-travel
                # ledger (read_avro_ocf(version=...)).  Written only
                # after read-back confirms THIS put is the committed
                # truth for this version.  Best-effort: a failed
                # snapshot write costs exactly that version's time
                # travel, detected loudly at read time ("no snapshot")
                # — it must not fail a commit that is already durable.
                try:
                    _write_bytes_generic(
                        _snapshot_path(path, new["version"]),
                        json.dumps(new, sort_keys=True).encode(),
                    )
                except OSError:
                    pass
                return new
            last_seen = check
    raise RuntimeError(
        f"manifest publish for {path!r} kept losing to a concurrent writer "
        f"(last observed: {last_seen!r}); serialize writers to this directory"
    )


def _schema_of_dir(path: str, version: int | None = None):
    files = _list_avro(path, version)
    if not files:
        # a manifest-managed directory whose every part was deleted
        # (full DELETE) still knows its schema — the manifest carries
        # it — so an empty table plans as empty, not as an error
        m = (
            _manifest_at(path, version)
            if version is not None
            else _read_manifest(path)
        )
        if m and m.get("schema"):
            return m["schema"], _spark_fields_of(m["schema"])
        raise ValueError(f"no .avro files under {path}")
    schema, _ = parse_ocf(_read_bytes(files[0]))
    if _norm_schema(schema).get("type") != "record":
        raise ValueError("top-level OCF schema must be a record")
    return schema, _spark_fields_of(schema)


def _file_rows(
    fname: str, schema, names, reader_schema: dict | None = None,
    json_fields: frozenset[str] | set[str] = frozenset(),
):
    fschema, recs = parse_ocf(_read_bytes(fname))
    if reader_schema is not None:  # per-file Avro schema resolution
        recs = [resolve_record(r, fschema, reader_schema) for r in recs]
    elif fschema != schema:
        raise ValueError(f"schema drift in {fname}")
    return [
        tuple(
            _to_json_cell(r[n]) if n in json_fields else r[n] for n in names
        )
        for r in recs
    ]


class AvroOcfReader(DataSourceReader):
    def __init__(
        self, path: str, schema, names, reader_schema: dict | None = None,
        json_fields: frozenset[str] = frozenset(),
        version: int | None = None,
    ):
        self.path, self.avro_schema, self.names = path, schema, names
        self.reader_schema = reader_schema
        self.json_fields = json_fields
        self.version = version

    def partitions(self):  # one partition per container file
        return [InputPartition(f) for f in _list_avro(self.path, self.version)]

    def read(self, partition):
        if partition is None:  # empty table: partitions() returned []
            return
        yield from _file_rows(
            partition.value, self.avro_schema, self.names, self.reader_schema,
            self.json_fields,
        )


def _stat_filter_supported(f) -> bool:
    """Filters the stats model can reason about: simple comparisons /
    null tests on one TOP-LEVEL column, plus ``Not(EqualTo)`` (a
    constant-column part proves ``!=`` dead).  Everything else is
    never examined (the file is kept)."""
    if isinstance(f, Not):
        return isinstance(f.child, EqualTo) and _stat_filter_supported(f.child)
    if not isinstance(
        f,
        (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual,
         In, IsNull, IsNotNull, StringStartsWith),
    ):
        return False
    attr = getattr(f, "attribute", None)
    return isinstance(attr, tuple) and len(attr) == 1


def _file_may_match(stats: dict | None, filters: list) -> bool:
    """Conservative overlap test: False ONLY when the part's stats
    PROVE no row can satisfy some pushed filter (the AND of the list).
    Missing stats, missing columns, missing min/max, or any cross-type
    comparison oddity keep the file — pruning may only ever remove
    certainly-dead files, never introduce wrong answers (Spark also
    re-evaluates every filter row-level above this scan)."""
    if not stats:
        return True
    rows = stats.get("rows")
    cols = stats.get("cols", {})
    for f in filters:
        target = f.child if isinstance(f, Not) else f
        ent = cols.get(target.attribute[0])
        if ent is None:
            continue
        nulls = ent.get("nulls", 0)
        lo, hi = ent.get("min"), ent.get("max")
        all_null = rows is not None and nulls >= rows
        try:
            if isinstance(f, Not):
                # Not(EqualTo(v)): null rows fail `!=` too (SQL
                # three-valued), so the part is dead when every
                # non-null value equals the literal — or none exist
                if all_null:
                    return False
                if lo is not None and lo == hi and lo == target.value:
                    return False
                continue
            if isinstance(f, IsNull):
                if nulls == 0:
                    return False
                continue
            if isinstance(f, IsNotNull):
                if all_null:
                    return False
                continue
            # every remaining form is a comparison — null rows cannot
            # satisfy it, so an all-null part is prunable outright
            if all_null:
                return False
            bloom = ent.get("bloom")
            if bloom is not None:  # point-lookup pruning: min/max is
                # useless on a hash-distributed key (every part spans
                # the range); the bloom answers the equality directly
                if isinstance(f, EqualTo) and not _bloom_may_contain(bloom, f.value):
                    return False
                if isinstance(f, In) and not any(
                    _bloom_may_contain(bloom, v) for v in f.value
                ):
                    return False
            if lo is None:
                continue  # no min/max recorded: cannot reason further
            if isinstance(f, EqualTo):
                if not (lo <= f.value <= hi):
                    return False
            elif isinstance(f, GreaterThan):
                if not (hi > f.value):
                    return False
            elif isinstance(f, GreaterThanOrEqual):
                if not (hi >= f.value):
                    return False
            elif isinstance(f, LessThan):
                if not (lo < f.value):
                    return False
            elif isinstance(f, LessThanOrEqual):
                if not (lo <= f.value):
                    return False
            elif isinstance(f, In):
                if not any(lo <= v <= hi for v in f.value):
                    return False
            elif isinstance(f, StringStartsWith):
                p = f.value
                if not (isinstance(p, str) and isinstance(lo, str)):
                    continue
                if hi < p:  # every value sorts before the prefix range
                    return False
                if p:  # strings with prefix p live in [p, p_successor)
                    nxt = p[:-1] + chr(ord(p[-1]) + 1)
                    if lo >= nxt:
                        return False
        except (TypeError, ValueError):
            continue  # cross-type comparison: keep the file
    return True


class AvroOcfPruningReader(AvroOcfReader):
    """File-skipping batch reader (``statsPruning=true``): pushed
    comparison filters are tested against each part's column stats and
    parts that provably contain no matching row are never opened — the
    parquet-style scan pruning story for the Avro lake.

    Stats resolve from ONE manifest read on a manifest-managed (URI-
    written) directory — per-part stats ride the commit messages into
    ``_manifest.json``, so planning cost stays O(1) object reads no
    matter how many parts — and from a small header probe per file
    (ranged read of ``kaop.stats``) on plain local directories.  A
    part with no stats anywhere is always kept.

    ``pushFilters`` returns EVERY input filter: stats prune whole
    files only, and Spark re-evaluates the predicates row-level above
    the scan, so a stale or absent stats entry can cost speed, never
    correctness.  Requires ``spark.sql.python.filterPushdown.enabled``
    (Spark refuses to plan a pushFilters reader without it — which is
    why this subclass is option-gated rather than the default)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.pushed: list = []

    def pushFilters(self, filters):
        self.pushed = [f for f in filters if _stat_filter_supported(f)]
        return filters  # Spark re-checks rows; we only skip dead files

    def partitions(self):
        files = _list_avro(self.path)
        if self.pushed and files:
            m = _read_manifest(self.path)
            if m is not None:  # one read covers every part's stats
                by_name = m.get("stats", {})
                stats = [by_name.get(f.rsplit("/", 1)[-1]) for f in files]
            else:  # local dir: ranged header probe per file
                stats = [_header_stats(f) for f in files]
            files = [
                f for f, s in zip(files, stats) if _file_may_match(s, self.pushed)
            ]
        return [InputPartition(f) for f in files]


#: statsFilter op name -> pyspark datasource Filter constructor (built
#: lazily in _parse_stats_filter so the module imports without 4.1).
_STATS_FILTER_OPS = frozenset(
    {"=", "!=", ">", ">=", "<", "<=", "in", "is_null", "is_not_null",
     "starts_with"}
)


def _parse_stats_filter(raw: str, names) -> list:
    """Parse the ``statsFilter`` stream-read option — a JSON list of
    ``[column, op]`` / ``[column, op, value]`` conditions ANDed
    together (ops: ``= != > >= < <= in is_null is_not_null
    starts_with``; ``in`` takes a JSON list value) — into the same
    pyspark ``Filter`` objects the batch ``pushFilters`` path
    receives, so ``_file_may_match`` serves both readers unchanged.

    ``DataSourceStreamReader`` has no ``pushFilters`` hook (no engine
    pushdown for Python stream sources as of pyspark 4.1), so a
    long-lived ingestion query that only ever wants a slice of the
    landing data declares the slice statically and the reader skips
    parts whose stats prove them dead.  Validation is loud and
    construction-time: unknown column or op raises before any batch
    runs."""
    if not _HAS_PUSHDOWN:  # pragma: no cover - pyspark>=4.1 guaranteed here
        raise ValueError("statsFilter requires pyspark>=4.1 Filter classes")
    try:
        spec = json.loads(raw)
    except json.JSONDecodeError as e:
        raise ValueError(f"statsFilter is not valid JSON: {e}") from None
    if not isinstance(spec, list) or not all(isinstance(c, list) for c in spec):
        raise ValueError(
            "statsFilter must be a JSON list of [column, op, value?] lists"
        )
    known = set(names)
    out = []
    for cond in spec:
        if len(cond) not in (2, 3):
            raise ValueError(f"statsFilter condition {cond!r} must have 2-3 items")
        col, op = cond[0], cond[1]
        val = cond[2] if len(cond) == 3 else None
        if col not in known:
            raise ValueError(f"statsFilter: no such column {col!r}")
        if op not in _STATS_FILTER_OPS:
            raise ValueError(
                f"statsFilter: unknown op {op!r} (one of {sorted(_STATS_FILTER_OPS)})"
            )
        attr = (col,)
        if op in ("is_null", "is_not_null"):
            if len(cond) == 3:
                raise ValueError(f"statsFilter: {op} takes no value: {cond!r}")
            out.append(IsNull(attr) if op == "is_null" else IsNotNull(attr))
            continue
        if len(cond) != 3:
            raise ValueError(f"statsFilter: {op} requires a value: {cond!r}")
        if op == "in":
            if not isinstance(val, list) or not val:
                raise ValueError(f"statsFilter: 'in' needs a non-empty list: {cond!r}")
            out.append(In(attr, tuple(val)))
        elif op == "=":
            out.append(EqualTo(attr, val))
        elif op == "!=":
            out.append(Not(EqualTo(attr, val)))
        elif op == ">":
            out.append(GreaterThan(attr, val))
        elif op == ">=":
            out.append(GreaterThanOrEqual(attr, val))
        elif op == "<":
            out.append(LessThan(attr, val))
        elif op == "<=":
            out.append(LessThanOrEqual(attr, val))
        elif op == "starts_with":
            if not isinstance(val, str):
                raise ValueError(f"statsFilter: starts_with needs a string: {cond!r}")
            out.append(StringStartsWith(attr, val))
    return out


class AvroOcfStreamReader(DataSourceStreamReader):
    """Landing-directory ingestion: the offset is the SET of file
    basenames already consumed (``{"files": [...]}``), so arrival
    order never matters — a newly landed file whose name sorts before
    already-consumed names (the uuid part names both writers emit are
    non-monotonic) is simply "not in the set yet" and gets ingested,
    and replay is exact because each offset names its files
    explicitly.  (The earlier file-COUNT offset over a sorted listing
    silently lost such a file AND re-read an old one for the slice.)
    At scale the name set grows with the directory; ``cleanSource=
    delete|archive`` (Spark's own file-source retention knob) retires
    committed files on commit, and names this reader itself removed
    prune out of subsequent offsets — they cannot legitimately
    reappear — so with retention on, listing cost and offset size
    stay O(live files), not O(files ever landed).

    ``maxFilesPerBatch`` (option) caps how many NEW files one
    micro-batch admits; a 10k-file backlog drains in ceil(N/cap)
    batches instead of one giant epoch.  Restart safety: a capped
    ``latestOffset`` computed from an EMPTY consumed-set on a
    restarted query would publish an offset BEHIND the checkpointed
    start and rewind the stream.  That cannot happen here: on every
    restart the engine re-plans the checkpoint's last batch —
    ``partitions(start, end)``/``commit(end)`` run with the restored
    offsets BEFORE the first ``latestOffset`` (verified against the
    runner's call order) — so the instance has re-learned the
    committed name set by the time it caps, while on a genuinely
    fresh query there is nothing to learn and capping from empty is
    exact.  As defense in depth, ``partitions`` raises loudly if it
    is ever handed a backward range (``end`` missing names from
    ``start``) instead of silently re-ingesting files.

    This is the PARTITIONED stream reader: only the file LISTING and
    offset bookkeeping run driver-side (metadata, same as any file
    source); ``partitions(start, end)`` yields one ``InputPartition``
    per new file and the container parse + record decode run in
    executor tasks — record payloads never funnel through the driver
    (a landing-directory source must scale with the number of landed
    files)."""

    def __init__(
        self, path: str, schema, names, reader_schema: dict | None = None,
        max_files_per_batch: int | None = None,
        clean_source: str = "off", archive_dir: str | None = None,
        json_fields: frozenset[str] = frozenset(),
        stat_filters: list | None = None,
    ):
        if clean_source not in ("off", "delete", "archive"):
            raise ValueError(f"cleanSource must be off|delete|archive, got {clean_source!r}")
        if clean_source == "archive" and not archive_dir:
            raise ValueError("cleanSource=archive requires sourceArchiveDir")
        if archive_dir and archive_dir.rstrip("/") == path.rstrip("/"):
            raise ValueError("sourceArchiveDir must differ from the landing directory")
        self.path, self.avro_schema, self.names = path, schema, names
        self.reader_schema = reader_schema
        self.max_files_per_batch = max_files_per_batch
        self.clean_source = clean_source
        self.archive_dir = archive_dir
        self.json_fields = json_fields
        #: static statsFilter predicates (pyspark Filter objects) — a
        #: new file whose stats prove no row matches is marked
        #: consumed in the offset (so cleanSource still retires it)
        #: but never opened or decoded
        self.stat_filters = stat_filters or []
        #: basenames covered by the last offset this instance returned
        #: or learned from the engine; None = fresh instance, unknown
        self._known: set[str] | None = None
        #: basenames this instance removed from the landing dir
        #: (cleanSource) — safe to prune from future offsets, since a
        #: name we deleted/archived cannot legitimately reappear
        self._cleaned: set[str] = set()


    def _names_of(self, offset: dict) -> set[str]:
        if "files" in offset:
            return set(offset["files"])
        # legacy count-offset from a pre-name-set checkpoint: best-
        # effort conversion via the sorted listing prefix it indexed
        names = sorted(p.rsplit("/", 1)[-1] for p in _list_avro(self.path))
        return set(names[: offset.get("n_files", 0)])

    def initialOffset(self) -> dict:
        self._known = set()  # fresh query: nothing consumed
        return {"files": []}

    def latestOffset(self) -> dict:
        listing = {p.rsplit("/", 1)[-1] for p in _list_avro(self.path)}
        if self._known is None:
            # First call of a fresh query (the engine may ask for the
            # latest offset before the initial one): nothing consumed.
            # A restarted query never reaches here with None — the
            # engine re-plans the checkpointed batch first, which
            # teaches partitions()/commit() the committed set.
            self._known = set()
        new = sorted(listing - self._known)
        if self.max_files_per_batch is not None:
            new = new[: self.max_files_per_batch]
        self._known |= set(new)
        return {"files": sorted(self._known)}

    def partitions(self, start: dict, end: dict):
        start_names, end_names = self._names_of(start), self._names_of(end)
        missing = start_names - end_names
        if missing:
            # names absent from both the end offset AND the landing
            # dir were retired by cleanSource — pruned state, not a
            # rewind.  A missing name still PRESENT in the directory
            # means the offset genuinely went backwards: raise rather
            # than silently re-ingest.
            listing = {p.rsplit("/", 1)[-1] for p in _list_avro(self.path)}
            still_there = sorted(missing & listing)
            if still_there:
                raise ValueError(
                    f"kaop_avro stream offset went backwards: end is missing "
                    f"{still_there[:5]} from start"
                )
        # ground truth from the engine (covers batch replay on restart).
        # Names this instance already retired must NOT re-learn here:
        # offsets written before a retirement still carry the old
        # names, and re-adding them would undo the pruning forever.
        self._known = (self._known or set()) | (end_names - self._cleaned)
        base = self.path.rstrip("/")
        new_names = sorted(end_names - start_names)
        if self.stat_filters and new_names:
            # statsFilter file skipping: same conservative overlap test
            # as the batch pruning reader — a part is dropped ONLY when
            # its stats PROVE no row matches.  Stats come from one
            # manifest read when the dir is manifest-managed, else a
            # ranged header probe per NEW file (bounded by
            # maxFilesPerBatch).  Dropped files stay in the offset:
            # consumed-but-never-opened, so they never come back and
            # cleanSource retires them like any committed file.
            m = _read_manifest(self.path)
            if m is not None:
                by_name = m.get("stats", {})
                stats = [by_name.get(n) for n in new_names]
            else:
                stats = [_header_stats(f"{base}/{n}") for n in new_names]
            new_names = [
                n for n, s in zip(new_names, stats)
                if _file_may_match(s, self.stat_filters)
            ]
        return [InputPartition(f"{base}/{n}") for n in new_names]

    def read(self, partition):  # executor-side decode, one task per file
        yield from _file_rows(
            partition.value, self.avro_schema, self.names, self.reader_schema,
            self.json_fields,
        )

    def commit(self, end: dict) -> None:
        # offsets live in the checkpoint log; learning the committed
        # set here restores the cap watermark when the engine commits
        # a restored batch after restart
        end_names = self._names_of(end)
        self._known = (self._known or set()) | (end_names - self._cleaned)
        if self.clean_source == "off":
            return
        # cleanSource retention (Spark's own file-source option): a
        # committed batch's files delete or archive out of the landing
        # directory, which bounds BOTH the per-trigger listing and —
        # because a name this reader removed can never legitimately
        # reappear — the offset state: retired names prune out of
        # every subsequent offset this instance publishes.
        base = self.path.rstrip("/")
        listing = {p.rsplit("/", 1)[-1] for p in _list_avro(self.path)}
        cleaned_now: set[str] = set()
        for name in sorted((end_names & listing) - self._cleaned):
            src = f"{base}/{name}"
            try:
                if self.clean_source == "delete":
                    _delete_file(src)
                else:
                    _move_file(src, f"{self.archive_dir.rstrip('/')}/{name}")
            except (OSError, FileNotFoundError):
                continue  # already cleaned / concurrently removed
            cleaned_now.add(name)
        if cleaned_now and _read_manifest(self.path) is not None:
            # manifest-managed landing dir: retire the parts from the
            # committed set too, or readers resolve dangling names
            def mutate(cur: dict) -> dict:
                cur["parts"] = sorted(set(cur.get("parts", [])) - cleaned_now)
                if "epochs" in cur:
                    cur["epochs"] = {
                        k: [p for p in v if p not in cleaned_now]
                        for k, v in cur["epochs"].items()
                    }
                _set_manifest_stats(cur, {})  # drop retired parts' stats
                return cur

            _publish_manifest(self.path, mutate)
        # retire everything committed that is no longer in the landing
        # dir — removed just now, OR by a previous incarnation of this
        # query before a restart (its checkpointed offsets still carry
        # the names; with retention on they can never come back)
        retired = (end_names - listing) | cleaned_now
        self._cleaned |= retired
        self._known -= retired


#: Spark type -> Avro type for the writer path (reverse of _AVRO_TO_SPARK).
_SPARK_TO_AVRO = {
    "boolean": "boolean", "integer": "int", "long": "long",
    "float": "float", "double": "double", "string": "string", "binary": "bytes",
}


def _avro_type_of(dtype, path: str):
    """Writer-side type mapping, recursive: arrays/maps/structs nest,
    timestamps and dates carry spec logical types, nullable container
    elements become ``["null", T]`` unions.  `path` seeds unique names
    for nested records (Avro named types need distinct fullnames)."""
    tn = dtype.typeName()
    if tn == "array":
        items = _avro_type_of(dtype.elementType, path + "_item")
        return {
            "type": "array",
            "items": ["null", items] if dtype.containsNull else items,
        }
    if tn == "map":
        if dtype.keyType.typeName() != "string":
            raise ValueError("Avro maps require string keys")
        values = _avro_type_of(dtype.valueType, path + "_value")
        return {
            "type": "map",
            "values": ["null", values] if dtype.valueContainsNull else values,
        }
    if tn == "struct":
        fields = []
        for f in dtype.fields:
            t = _avro_type_of(f.dataType, f"{path}_{f.name}")
            fields.append({"name": f.name, "type": ["null", t] if f.nullable else t})
        return {"type": "record", "name": f"Rec_{path}", "fields": fields}
    if tn in ("timestamp", "timestamp_ntz"):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if tn == "date":
        return {"type": "int", "logicalType": "date"}
    if tn == "decimal":
        return {
            "type": "bytes", "logicalType": "decimal",
            "precision": dtype.precision, "scale": dtype.scale,
        }
    if tn in _SPARK_TO_AVRO:
        return _SPARK_TO_AVRO[tn]
    raise ValueError(f"cannot write Spark type {tn!r} as Avro")


def _avro_schema_of(struct) -> dict:
    """Writer-side schema mapping: StructType -> Avro record; nullable
    columns become ``["null", T]`` unions (Spark columns are nullable
    by default, and the union round-trips through the reader)."""
    fields = []
    for f in struct.fields:
        t = _avro_type_of(f.dataType, f.name)
        fields.append(
            {"name": f.name, "type": ["null", t] if f.nullable else t}
        )
    return {"type": "record", "name": "SparkRecord", "fields": fields}


class _OcfCommit(WriterCommitMessage):
    """One task's written parts: ``[(path_or_name, stats), ...]`` — a
    LIST because ``maxRecordsPerPart`` can split one task's rows into
    several container files.  ``stats`` (collect_stats) rides to the
    driver so URI-mode commits fold it into the manifest and file
    skipping plans from ONE manifest read, not per-part probes."""

    def __init__(self, parts: list[tuple[str, dict | None]]):
        self.parts = parts


def _chunked(records: list[dict], cap: int | None):
    """Split a task's records into <=cap-record part payloads (one
    payload when no cap): bounds the size of any single container
    file regardless of how large an input partition lands."""
    if cap is None or len(records) <= cap:
        yield records
        return
    for i in range(0, len(records), cap):
        yield records[i : i + cap]


def _set_manifest_stats(cur: dict, new_stats: dict[str, dict]) -> None:
    """Fold per-part stats into a manifest body and drop entries for
    parts no longer committed (keeps the manifest bounded across
    overwrites, epoch replays, and cleanSource retirement)."""
    merged = {**cur.get("stats", {}), **new_stats}
    live = set(cur.get("parts", []))
    cur["stats"] = {k: v for k, v in merged.items() if k in live}


class AvroOcfWriter(DataSourceWriter):
    """Per-task OCF part writer, two commit protocols:

    - LOCAL paths: standard temp-then-rename — tasks write
      ``_tmp_*.avro``, the driver's ``commit`` renames them into place
      (deleting prior parts first on overwrite), ``abort`` deletes the
      temps — failed/speculative tasks never leave visible partial
      files.
    - URI paths (object stores — no atomic rename): tasks write final
      uniquely-named parts directly; ``commit`` publishes them by
      PUTting ``_manifest.json`` (readers of a manifest-managed dir
      never consult the raw listing, so uncommitted parts are
      invisible); overwrite deletes the previously committed set
      best-effort after the new manifest lands.

    Part names carry a per-job uuid so successive ``append`` writes
    into one directory never collide."""

    def __init__(
        self, path: str, avro_schema: dict, names, overwrite: bool,
        codec: str = "null", bloom_cols: frozenset[str] = frozenset(),
        max_records_per_part: int | None = None,
        bloom_bits_per_key: int = _BLOOM_BITS_PER_KEY,
        retain_history: bool = False,
    ):
        import uuid as _uuid

        self.path, self.avro_schema, self.names = path, avro_schema, names
        self.overwrite = overwrite
        # Delta-style history retention (URI mode): overwrite leaves
        # the replaced parts on disk as manifest-orphans, so
        # read_avro_ocf(version=...) can still reach pre-overwrite
        # snapshots until vacuum's grace expires.  Default False keeps
        # the eager best-effort cleanup (no storage growth surprise).
        self.retain_history = retain_history
        self.codec = codec
        self.bloom_cols = bloom_cols
        self.max_records_per_part = max_records_per_part
        self.bloom_bits_per_key = bloom_bits_per_key
        self.job_id = _uuid.uuid4().hex[:12]
        self.uri_mode = "://" in path

    def write(self, iterator) -> _OcfCommit:
        import uuid as _uuid

        records = [{n: row[n] for n in self.names} for row in iterator]
        parts: list[tuple[str, dict | None]] = []
        for chunk in _chunked(records, self.max_records_per_part):
            if not chunk:
                continue  # empty partition -> no file
            stats = collect_stats(
                chunk, self.names, self.bloom_cols, self.bloom_bits_per_key
            )
            meta = {STATS_META_KEY: json.dumps(stats, sort_keys=True).encode()}
            if self.uri_mode:  # final name now; published only via manifest
                name = f"part-{self.job_id}-{_uuid.uuid4().hex[:8]}.avro"
                write_avro_ocf(
                    f"{self.path.rstrip('/')}/{name}",
                    chunk, self.avro_schema, codec=self.codec, extra_meta=meta,
                )
                parts.append((name, stats))
            else:
                tmp = os.path.join(self.path, f"_tmp_{_uuid.uuid4().hex}.avro")
                write_avro_ocf(tmp, chunk, self.avro_schema,
                               codec=self.codec, extra_meta=meta)
                parts.append((tmp, stats))
        return _OcfCommit(parts)

    def commit(self, messages) -> None:
        new = [p for m in messages if m is not None for p, _ in m.parts]
        new_stats = {
            p: st for m in messages if m is not None for p, st in m.parts if st
        }
        if self.uri_mode:
            replaced: list[str] = []

            def mutate(cur: dict) -> dict:
                # computed against the CURRENT committed state on every
                # retry: a concurrent append's parts fold in (uuid part
                # names never collide), overwrite replaces whatever is
                # committed at publish time.
                if self.overwrite:
                    replaced[:] = cur.get("parts", [])
                    cur.pop("epochs", None)
                    cur["parts"] = sorted(set(new))
                else:
                    cur["parts"] = sorted(set(cur.get("parts", [])) | set(new))
                # the schema rides the manifest so a directory whose
                # every part is later deleted (full DELETE) stays
                # readable as an EMPTY table instead of erroring
                cur["schema"] = self.avro_schema
                _set_manifest_stats(cur, new_stats)
                return cur

            _publish_manifest(self.path, mutate)
            base = self.path.rstrip("/")
            if not self.retain_history:
                for name in replaced:  # best-effort cleanup of replaced parts
                    try:
                        _delete_file(f"{base}/{name}")
                    except OSError:
                        pass
            return
        if self.overwrite:
            for f in _list_avro(self.path):  # committed parts only
                os.remove(f)
        for i, tmp in enumerate(new):
            os.replace(
                tmp, os.path.join(self.path, f"part-{self.job_id}-{i:05d}.avro")
            )

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            for p, _ in m.parts:
                if self.uri_mode:
                    try:
                        _delete_file(f"{self.path.rstrip('/')}/{p}")
                    except OSError:
                        pass
                elif os.path.exists(p):
                    os.remove(p)


class AvroOcfStreamWriter(DataSourceStreamWriter):
    """writeStream sink: each micro-batch commits its tasks' temp
    files as ``part-<batchId>-<i>.avro``.  Exactly-once lands for
    free: a REPLAYED epoch (foreachBatch/sink retry semantics) renames
    over its own batch-stamped part names instead of appending new
    ones, so readers never see a half-committed or doubled epoch.

    URI paths use the manifest protocol instead of rename: parts are
    final-named at write, and ``commit`` swaps the epoch's entry in
    ``_manifest.json`` (an ``epochs`` map keyed by batchId) — a
    replayed epoch REPLACES its prior part set in the manifest, then
    best-effort deletes the superseded files."""

    def __init__(
        self, path: str, avro_schema: dict, names, codec: str = "null",
        bloom_cols: frozenset[str] = frozenset(),
        max_records_per_part: int | None = None,
        bloom_bits_per_key: int = _BLOOM_BITS_PER_KEY,
    ):
        self.path, self.avro_schema, self.names = path, avro_schema, names
        self.codec = codec
        self.bloom_cols = bloom_cols
        self.max_records_per_part = max_records_per_part
        self.bloom_bits_per_key = bloom_bits_per_key
        self.uri_mode = "://" in path

    def write(self, iterator) -> _OcfCommit:
        import uuid as _uuid

        records = [{n: row[n] for n in self.names} for row in iterator]
        parts: list[tuple[str, dict | None]] = []
        for chunk in _chunked(records, self.max_records_per_part):
            if not chunk:
                continue
            stats = collect_stats(
                chunk, self.names, self.bloom_cols, self.bloom_bits_per_key
            )
            meta = {STATS_META_KEY: json.dumps(stats, sort_keys=True).encode()}
            if self.uri_mode:
                name = f"part-{_uuid.uuid4().hex}.avro"
                write_avro_ocf(
                    f"{self.path.rstrip('/')}/{name}",
                    chunk, self.avro_schema, codec=self.codec, extra_meta=meta,
                )
                parts.append((name, stats))
            else:
                tmp = os.path.join(self.path, f"_tmp_{_uuid.uuid4().hex}.avro")
                write_avro_ocf(tmp, chunk, self.avro_schema,
                               codec=self.codec, extra_meta=meta)
                parts.append((tmp, stats))
        return _OcfCommit(parts)

    def commit(self, messages, batchId: int) -> None:
        new = [p for m in messages if m is not None for p, _ in m.parts]
        new_stats = {
            p: st for m in messages if m is not None for p, st in m.parts if st
        }
        if self.uri_mode:
            replaced: list[str] = []

            def mutate(cur: dict) -> dict:
                epochs = cur.get("epochs", {})
                replaced[:] = epochs.get(str(batchId), [])  # replayed epoch
                epochs[str(batchId)] = new
                parts = [p for p in cur.get("parts", []) if p not in replaced]
                cur["epochs"] = epochs
                cur["parts"] = sorted(set(parts) | set(new))
                cur["schema"] = self.avro_schema  # see batch commit note
                _set_manifest_stats(cur, new_stats)
                return cur

            _publish_manifest(self.path, mutate)
            for name in replaced:
                try:
                    _delete_file(f"{self.path.rstrip('/')}/{name}")
                except OSError:
                    pass
            return
        for i, tmp in enumerate(new):
            os.replace(
                tmp, os.path.join(self.path, f"part-{batchId:08d}-{i:04d}.avro")
            )

    def abort(self, messages, batchId: int) -> None:  # noqa: ARG002
        for m in messages:
            if m is None:
                continue
            for p, _ in m.parts:
                if self.uri_mode:
                    try:
                        _delete_file(f"{self.path.rstrip('/')}/{p}")
                    except OSError:
                        pass
                elif os.path.exists(p):
                    os.remove(p)


class AvroOcfDataSource(DataSource):
    """``format("kaop_avro").option("path", dir)`` — batch reads fan
    out one executor partition per container file; streaming ingests a
    growing landing directory with consumed-file-name-set offsets
    (arrival-order independent, optionally rate-limited via
    ``maxFilesPerBatch``; partitioned reader: executors decode);
    batch writes emit one container part
    per task with temp-then-rename commit; stream writes commit
    batch-stamped parts per epoch (replay-safe).

    Options: ``path`` (required); ``readerSchema`` (Avro schema JSON —
    read evolved files as one table via per-file schema resolution;
    without it schema drift is an error); ``statsPruning=true`` (batch
    read side: skip container files whose per-part column stats —
    written by this source into every part's header under
    ``kaop.stats`` and folded into ``_manifest.json`` on URI commits —
    prove no row matches the pushed filters; requires
    ``spark.sql.python.filterPushdown.enabled=true``, prunes files
    only, Spark still evaluates every predicate row-level);
    ``bloomColumns`` (write side: comma-separated int/string columns
    that additionally get a per-part bloom filter in their stats — the
    point-lookup complement to min/max for hash-distributed keys,
    consulted by ``statsPruning`` for ``=`` and ``IN``;
    ``bloomBitsPerKey`` sizes the filters — default 10 ≈ 1% fpp,
    raise for fewer false-positive part opens at larger stats size,
    8 KB/column/part hard cap regardless); ``codec``
    (write side: ``null`` default or ``deflate``); ``maxRecordsPerPart``
    (write side, batch AND stream: split any task's rows into
    <=N-record container files — bounds the largest part a skewed or
    coarse input partition can produce, each split part carrying its
    own stats/bloom); ``maxFilesPerBatch``
    (stream
    read side: admit at most N new files per micro-batch — a landed
    backlog drains in ceil(N/cap) batches instead of one giant
    epoch); ``statsFilter`` (stream read side: a STATIC predicate —
    JSON list of ``[column, op, value?]`` conditions ANDed together,
    ops ``= != > >= < <= in is_null is_not_null starts_with`` — that
    skips landed parts whose stats prove no row matches; the stream
    twin of ``statsPruning``, declared as an option because Python
    stream sources have no ``pushFilters`` hook.  File-level IO
    reduction ONLY: rows from surviving parts are NOT filtered, so the
    query must still apply the predicate — exactly like Spark
    re-evaluating pushed filters above a batch scan.  Incompatible
    with ``readerSchema``, raises); ``cleanSource`` =
    ``delete``/``archive`` (+
    ``sourceArchiveDir``) retires each committed batch's files from
    the landing directory — the retention knob that keeps the
    per-trigger listing AND the name-set offset bounded on a
    long-lived stream.  Paths accept ``file://`` and
    other pyarrow-filesystem URIs on BOTH sides: reads list and fetch
    through pyarrow's fs, and URI writes commit via the
    ``_manifest.json`` protocol (final-named parts published by one
    manifest PUT — no rename needed, so object stores work;
    single-writer per directory).  Local paths keep the classic
    temp-then-rename commit and need no manifest."""

    @classmethod
    def name(cls) -> str:
        return "kaop_avro"

    def _reader_schema(self) -> dict | None:
        raw = self.options.get("readerschema") or self.options.get("readerSchema")
        return json.loads(raw) if raw else None

    def _version_as_of(self) -> int | None:
        raw = self.options.get("versionasof", self.options.get("versionAsOf"))
        return int(raw) if raw is not None else None

    def _resolved(self):
        path = self.options.get("path")
        if not path:
            raise ValueError("kaop_avro requires .option('path', <dir>)")
        rs = self._reader_schema()
        if rs is not None:
            # output shape comes from the READER schema; files resolve
            schema = None
            fields = _spark_fields_of(rs)
        else:
            schema, fields = _schema_of_dir(path, self._version_as_of())
        return path, schema, [n for n, _, _ in fields], fields, rs

    def schema(self) -> str:
        _, _, _, fields, _ = self._resolved()
        return ", ".join(f"{n} {t}" for n, t, _ in fields)

    def _json_fields(self, fields) -> frozenset[str]:
        return frozenset(n for n, _, is_json in fields if is_json)

    def reader(self, schema) -> AvroOcfReader:  # noqa: ARG002
        path, avsc, names, fields, rs = self._resolved()
        prune = str(
            self.options.get("statspruning", self.options.get("statsPruning", "false"))
        ).lower() == "true"
        # statsPruning is an opt-in subclass, not the default, because
        # Spark refuses to plan ANY reader that implements pushFilters
        # unless spark.sql.python.filterPushdown.enabled is set — the
        # plain reader must keep working on vanilla sessions.  With a
        # readerSchema the option downgrades to the plain reader:
        # alias resolution can remap reader column names onto
        # different writer fields, and stats recorded under writer
        # names must not be trusted for renamed columns.
        version = self._version_as_of()
        # versionAsOf downgrades statsPruning like readerSchema does:
        # the stats index lives in the CURRENT manifest and is not
        # trustworthy for a historical part set.  Plain reader on the
        # snapshot's parts is always correct.
        if prune and rs is None and version is None and _HAS_PUSHDOWN:
            return AvroOcfPruningReader(
                path, avsc, names, rs, self._json_fields(fields)
            )
        return AvroOcfReader(
            path, avsc, names, rs, self._json_fields(fields), version
        )

    def streamReader(self, schema) -> AvroOcfStreamReader:  # noqa: ARG002
        if self._version_as_of() is not None:
            raise ValueError(
                "versionAsOf applies to batch reads; a stream tails the "
                "live landing directory, not a historical snapshot"
            )
        path, avsc, names, fields, rs = self._resolved()

        def opt(key, default=None):
            return self.options.get(key.lower(), self.options.get(key, default))

        cap = opt("maxFilesPerBatch")
        raw_filter = opt("statsFilter")
        stat_filters = None
        if raw_filter:
            if rs is not None:
                # same reasoning as the batch statsPruning downgrade —
                # alias resolution can remap reader names onto
                # different writer fields and stats live under writer
                # names — but statsFilter is an EXPLICIT user request,
                # so failing loudly beats silently not pruning.
                raise ValueError(
                    "statsFilter cannot be combined with readerSchema: "
                    "stats are recorded under writer field names"
                )
            stat_filters = _parse_stats_filter(str(raw_filter), names)
        return AvroOcfStreamReader(
            path, avsc, names, rs,
            max_files_per_batch=int(cap) if cap is not None else None,
            clean_source=str(opt("cleanSource", "off")).lower(),
            archive_dir=opt("sourceArchiveDir"),
            json_fields=self._json_fields(fields),
            stat_filters=stat_filters,
        )

    def _write_target(self):
        path = self.options.get("path")
        if not path:
            raise ValueError("kaop_avro requires .option('path', <dir>)")
        codec = self.options.get("codec", "null")
        if "://" in path:
            # URI (object-store) writes use the manifest protocol.
            # Seed the manifest BEFORE any task writes: from then on
            # readers resolve through the manifest, so final-named
            # in-flight parts can never leak via the listing fallback.
            # Seeding folds in any externally-produced parts already
            # present.
            import pyarrow.fs as pafs

            fs, rel = pafs.FileSystem.from_uri(path)
            fs.create_dir(rel, recursive=True)
            if _read_manifest(path) is None:
                existing = [p.rsplit("/", 1)[1] for p in _list_avro(path)]

                def seed(cur: dict) -> dict:
                    # a concurrent writer may have seeded between the
                    # read above and this publish — keep its part set
                    cur["parts"] = sorted(set(cur.get("parts", existing)))
                    return cur

                _publish_manifest(path, seed)
            return path, codec
        os.makedirs(path, exist_ok=True)
        return path, codec

    def _bloom_cols(self, schema) -> frozenset[str]:
        """Parse + validate the ``bloomColumns`` write option: designated
        columns must be integer- or string-typed (bloom equality needs a
        canonical value representation; floats/bools have none useful).
        Fails fast at writer construction, not per-task."""
        raw = self.options.get("bloomcolumns", self.options.get("bloomColumns"))
        if not raw:
            return frozenset()
        cols = frozenset(c.strip() for c in str(raw).split(",") if c.strip())
        ok_types = ("byte", "short", "integer", "long", "string")
        by_name = {f.name: f.dataType.typeName() for f in schema.fields}
        for c in sorted(cols):
            if c not in by_name:
                raise ValueError(f"bloomColumns: no such column {c!r}")
            if by_name[c] not in ok_types:
                raise ValueError(
                    f"bloomColumns: {c!r} is {by_name[c]}; only integer and "
                    f"string columns support bloom pruning"
                )
        return cols

    def _bloom_bits_per_key(self) -> int:
        raw = self.options.get(
            "bloombitsperkey", self.options.get("bloomBitsPerKey")
        )
        if raw is None:
            return _BLOOM_BITS_PER_KEY
        bits = int(raw)
        if bits < 1:
            raise ValueError(f"bloomBitsPerKey must be >= 1, got {bits}")
        return bits

    def _max_records_per_part(self) -> int | None:
        raw = self.options.get(
            "maxrecordsperpart", self.options.get("maxRecordsPerPart")
        )
        if raw is None:
            return None
        cap = int(raw)
        if cap < 1:
            raise ValueError(f"maxRecordsPerPart must be >= 1, got {cap}")
        return cap

    def writer(self, schema, overwrite: bool) -> AvroOcfWriter:
        path, codec = self._write_target()
        retain = str(
            self.options.get(
                "retainhistory", self.options.get("retainHistory", "false")
            )
        ).lower() in ("true", "1", "yes")
        return AvroOcfWriter(
            path, _avro_schema_of(schema), [f.name for f in schema.fields],
            overwrite, codec, self._bloom_cols(schema),
            self._max_records_per_part(), self._bloom_bits_per_key(),
            retain_history=retain,
        )

    def streamWriter(self, schema, overwrite: bool) -> AvroOcfStreamWriter:  # noqa: ARG002
        path, codec = self._write_target()
        return AvroOcfStreamWriter(
            path, _avro_schema_of(schema), [f.name for f in schema.fields], codec,
            self._bloom_cols(schema), self._max_records_per_part(),
            self._bloom_bits_per_key(),
        )


def register(spark) -> None:
    """Idempotent registration of the OCF source on a session."""
    spark.dataSource.register(AvroOcfDataSource)


# --------------------------------------------------------------------------
# lake maintenance: compaction + vacuum
#
# Streaming epochs and frequent small appends land one part per task
# per job — after thousands of commits a directory goes listing-bound
# and per-file overheads dominate (the same failure mode
# compact_index addresses for the dedup stores).  ``compact_avro_dir``
# rewrites the COMMITTED row set dense; ``vacuum_avro_dir`` retires the
# invisible debris (aborted/orphaned final-named parts on
# manifest-managed dirs, ``_tmp_`` leftovers from crashed local jobs)
# that readers already cannot see but storage still pays for.
# --------------------------------------------------------------------------


def _stats_rows_of_dir(path: str, files: list[str]) -> int | None:
    """Total committed row count from per-part stats — manifest first
    (one read), header probes otherwise; None when any part lacks
    stats (caller falls back to counting)."""
    m = _read_manifest(path)
    stats: list[dict | None]
    if m is not None and m.get("stats"):
        by_name = m["stats"]
        stats = [by_name.get(f.rsplit("/", 1)[-1]) for f in files]
    else:
        stats = [_header_stats(f) for f in files]
    if any(s is None or "rows" not in s for s in stats):
        return None
    return sum(s["rows"] for s in stats)


def _bloom_cols_of_dir(path: str, files: list[str]) -> frozenset[str]:
    """Columns any committed part carries a bloom for (so compaction
    preserves the dir's bloom coverage without being told)."""
    m = _read_manifest(path)
    if m is not None and m.get("stats"):
        entries = list(m["stats"].values())
    else:
        entries = [s for s in (_header_stats(f) for f in files) if s]
    return frozenset(
        c for s in entries for c, ent in s.get("cols", {}).items() if "bloom" in ent
    )


def write_avro_clustered(
    df,
    path: str,
    cluster_by: list[str],
    num_parts: int | None = None,
    codec: str = "null",
    bloom_columns: tuple[str, ...] = (),
    max_records_per_part: int | None = None,
    mode: str = "append",
) -> None:
    """Range-cluster ``df`` on ``cluster_by`` and write it as a
    ``kaop_avro`` directory whose parts each cover a NARROW, mostly
    disjoint slice of the clustering key — the data layout that makes
    min/max ``statsPruning``/``statsFilter`` actually effective.

    Why this exists: per-part min/max stats prune nothing on a
    randomly laid-out table (every part spans the whole key range, so
    every range predicate overlaps every part — the bloom option is
    the point-lookup workaround, but range scans stay full-table).
    Clustering is the standard lake fix (Delta/Iceberg ``OPTIMIZE …
    CLUSTER BY``): ``repartitionByRange`` computes sampled range
    boundaries (one shuffle, skew-tolerant — a heavy key simply owns
    more parts) and ``sortWithinPartitions`` orders rows inside each
    part executor-side (no extra shuffle), so a selective range filter
    later plans only the handful of parts whose slice overlaps it.

    The write itself goes through the source's normal commit protocol
    (temp-then-rename locally, manifest PUT on URI paths) with stats,
    ``bloom_columns``, and ``max_records_per_part`` riding the usual
    write options."""
    if not cluster_by:
        raise ValueError("cluster_by must name at least one column")
    missing = sorted(set(cluster_by) - set(df.columns))
    if missing:
        raise ValueError(f"cluster_by: no such columns {missing}")
    register(df.sparkSession)
    out = (
        df.repartitionByRange(num_parts, *cluster_by)
        if num_parts is not None
        else df.repartitionByRange(*cluster_by)
    ).sortWithinPartitions(*cluster_by)
    wr = out.write.format("kaop_avro").option("path", path).option("codec", codec)
    if bloom_columns:
        wr = wr.option("bloomColumns", ",".join(bloom_columns))
    if max_records_per_part is not None:
        wr = wr.option("maxRecordsPerPart", str(max_records_per_part))
    wr.mode(mode).save()


def zorder_expr(df, zorder_by: list[str], bits: int = 8):
    """Bit-interleaved Z-value (Morton code) over 2+ numeric columns.

    Each column is bucketed into 2^bits equal-width levels between its
    own min and max (ONE tiny driver-collected aggregate — 2 scalars
    per column, the same bounded-metadata class as repartitionByRange's
    sampled boundaries), then the level bits interleave:
    bit (i * ncols + c) of z = bit i of column c's level.  Sorting by z
    walks the space-filling curve, so any contiguous z-range is a small
    hyper-rectangle in the column space — which is exactly what makes
    EVERY zorder column's per-part min/max tight, not just the first
    one as with lexicographic clustering.

    The z-value affects file LAYOUT only, never query results, so the
    float bucket math needs no cross-engine determinism contract."""
    from pyspark.sql import functions as F

    if len(zorder_by) < 2:
        raise ValueError("zorder_by needs >= 2 columns (use cluster_by for 1)")
    aggs = []
    for c in zorder_by:
        aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
    bounds = df.agg(*aggs).collect()[0]
    n = len(zorder_by)
    levels = []
    for c in zorder_by:
        mn, mx = float(bounds[f"mn_{c}"]), float(bounds[f"mx_{c}"])
        if mx <= mn:
            levels.append("CAST(0 AS BIGINT)")
            continue
        levels.append(
            f"LEAST(CAST({(1 << bits) - 1} AS BIGINT), GREATEST(CAST(0 AS BIGINT), "
            f"CAST(floor((COALESCE(CAST(`{c}` AS DOUBLE), {mn!r}) - {mn!r})"
            f" / {mx - mn!r} * {1 << bits}) AS BIGINT)))"
        )
    terms = []
    for ci, lvl in enumerate(levels):
        for i in range(bits):
            terms.append(
                f"shiftleft(shiftright({lvl}, {i}) & CAST(1 AS BIGINT), {i * n + ci})"
            )
    return F.expr(" + ".join(terms))


def write_avro_zordered(
    df,
    path: str,
    zorder_by: list[str],
    bits: int = 8,
    num_parts: int | None = None,
    codec: str = "null",
    bloom_columns: tuple[str, ...] = (),
    max_records_per_part: int | None = None,
    mode: str = "append",
) -> None:
    """Z-order-cluster ``df`` on 2+ columns and write it as a
    ``kaop_avro`` directory — the multi-column upgrade of
    ``write_avro_clustered``: lexicographic range clustering gives
    tight per-part min/max on the LEADING key only (a filter on the
    second column overlaps every part), while the Morton interleave
    makes each part a small hyper-rectangle in the full column space,
    so ``statsPruning``/``statsFilter`` range predicates on ANY of the
    zorder columns skip files (the Delta ``OPTIMIZE … ZORDER BY``
    story).  Same single write-time shuffle as the 1-D form."""
    missing = sorted(set(zorder_by) - set(df.columns))
    if missing:
        raise ValueError(f"zorder_by: no such columns {missing}")
    register(df.sparkSession)
    z = zorder_expr(df, zorder_by, bits)
    tagged = df.withColumn("__kaop_z", z)
    out = (
        tagged.repartitionByRange(num_parts, "__kaop_z")
        if num_parts is not None
        else tagged.repartitionByRange("__kaop_z")
    ).sortWithinPartitions("__kaop_z").drop("__kaop_z")
    wr = out.write.format("kaop_avro").option("path", path).option("codec", codec)
    if bloom_columns:
        wr = wr.option("bloomColumns", ",".join(bloom_columns))
    if max_records_per_part is not None:
        wr = wr.option("maxRecordsPerPart", str(max_records_per_part))
    wr.mode(mode).save()


def compact_avro_dir(
    spark,
    path: str,
    target_records: int = 100_000,
    codec: str = "null",
    reader_schema: dict | None = None,
    cluster_by: list[str] | None = None,
) -> dict:
    """Rewrite a ``kaop_avro`` directory's committed rows into
    ``ceil(rows / target_records)`` parts, preserving per-part stats
    and bloom coverage (recomputed for the new parts).

    One distributed job: the scan reads the committed parts (tasks
    hold them until the driver commit, so retries are safe), the
    shuffle repartitions to the target count, and the write commits
    through the source's own overwrite protocol — local dirs
    temp-then-rename, manifest dirs a SINGLE manifest PUT that swaps
    the part set (readers see wholly-old or wholly-new, never a mix;
    superseded parts are then deleted best-effort and any stragglers
    are ``vacuum_avro_dir``'s job).  Planning reads the row count from
    the parts' own stats when every part carries them — no data pass.

    ``reader_schema`` compacts a schema-evolved directory: files
    resolve per record and the rewritten parts all carry the reader
    schema (upgrading the directory in place).

    Schema normalization, stated plainly: the rewritten parts carry
    the SPARK-derived schema of the read (timestamps/dates/decimals
    keep their logical types, but Avro ``enum`` columns become plain
    strings, ``fixed`` becomes ``bytes``, and recursive-typed fields
    stay the JSON string columns the reader surfaced).  A directory
    whose consumers depend on those exact Avro declarations should
    not be compacted through this path.

    Do NOT compact a LANDING directory a stream is actively consuming:
    the stream's consumed-name-set offsets would treat the merged
    parts as brand-new files and re-ingest every row.  Compaction is
    for batch-maintained lake directories; landing-dir retention is
    ``cleanSource``.

    Serialize compaction with WRITERS to the same directory (the
    manifest protocol's standing single-writer-per-commit-window
    rule): the overwrite commit replaces the committed set as of
    publish time, so an append that commits between this function's
    scan and its publish would be replaced without having been read.
    Maintenance windows — the way every table format schedules
    compaction — satisfy this.
    """
    import math as _math

    register(spark)
    files = _list_avro(path)
    if not files:
        return {"parts_before": 0, "parts_after": 0, "rows": 0}
    rd = spark.read.format("kaop_avro").option("path", path)
    if reader_schema is not None:
        rd = rd.option("readerSchema", json.dumps(reader_schema))
    df = rd.load()
    rows = _stats_rows_of_dir(path, files)
    if rows is None:
        rows = df.count()  # stats-less legacy parts: one counting pass
    bloom_cols = _bloom_cols_of_dir(path, files)
    target_parts = max(1, _math.ceil(rows / max(1, target_records)))
    if cluster_by:
        # compaction that also CLUSTERS — the OPTIMIZE…CLUSTER BY of
        # this lake: the rewrite's shuffle range-partitions on the
        # clustering key and sorts within parts, so the compacted
        # directory's min/max stats become tight and disjoint (see
        # write_avro_clustered for why that is what makes range
        # pruning effective).  Same shuffle count as the plain
        # rewrite — clustering here is free.
        missing = sorted(set(cluster_by) - set(df.columns))
        if missing:
            raise ValueError(f"cluster_by: no such columns {missing}")
        shuffled = df.repartitionByRange(
            target_parts, *cluster_by
        ).sortWithinPartitions(*cluster_by)
    else:
        shuffled = df.repartition(target_parts)
    wr = (
        shuffled
        .write.format("kaop_avro")
        .option("path", path)
        .option("codec", codec)
    )
    if bloom_cols:
        wr = wr.option("bloomColumns", ",".join(sorted(bloom_cols)))
    wr.mode("overwrite").save()
    return {
        "parts_before": len(files),
        "parts_after": len(_list_avro(path)),
        "rows": rows,
    }


def delete_where_avro_dir(
    spark,
    path: str,
    predicate: str,
    prune_filter: str | list | None = None,
    codec: str = "null",
    retain_history: bool = False,
) -> dict:
    """Targeted row deletion — the GDPR/right-to-be-forgotten purge —
    with DELETE's SQL semantics: rows where ``predicate`` evaluates
    TRUE are removed; FALSE and NULL rows are kept.

    The scale property is that only AFFECTED parts are rewritten:
    ``prune_filter`` (the ``statsFilter`` mini-language — a JSON list
    of ``[column, op, value]`` conditions ANDed together) selects the
    parts whose min/max stats or blooms ADMIT a matching row, exactly
    as the pruning readers do; every other part is untouched — not
    read, not rewritten, not rewritten-identically.  On a lake where
    the delete key is clustered or bloom-indexed, purging one user
    touches a handful of parts out of millions.

    CALLER CONTRACT: ``prune_filter`` must be IMPLIED by
    ``predicate`` — every row the predicate matches must satisfy the
    prune conditions (e.g. predicate ``o_orderkey = 7 AND
    o_totalprice > 10`` with prune ``[["o_orderkey", "=", 7]]``).  A
    prune filter the predicate does not imply can hide matching rows
    inside skipped parts: deletion silently misses them.  Omit
    ``prune_filter`` to rewrite every part (always correct).

    Commit: manifest-managed (URI) directories swap affected parts
    for their filtered rewrites in ONE manifest PUT (readers see
    wholly-old or wholly-new; ``retain_history`` keeps the superseded
    parts for time travel, else they are best-effort deleted and
    ``vacuum_avro_dir`` collects stragglers).  Local classic
    directories rename the rewrites into place and then remove the
    originals — a crash between the two leaves recoverable DUPLICATE
    rows, never lost ones.  Serialize with writers, same as
    compaction.  Schema normalization also matches compaction
    (enum->string, fixed->bytes, recursion->JSON strings).
    """
    import uuid as _uuid

    from pyspark.sql import functions as F

    register(spark)
    files = _list_avro(path)
    if not files:
        return {"parts_total": 0, "parts_rewritten": 0,
                "rows_deleted": 0, "rows_kept": 0}
    dir_schema, dir_fields = _schema_of_dir(path)
    names = [n for n, _, _ in dir_fields]
    if any(is_json for _, _, is_json in dir_fields):
        raise ValueError(
            "delete_where_avro_dir cannot rewrite recursive-typed "
            "(JSON-surfaced) columns part-for-part; compact the "
            "directory first"
        )

    if prune_filter is not None:
        raw = prune_filter if isinstance(prune_filter, str) else json.dumps(
            prune_filter
        )
        filters = _parse_stats_filter(raw, names)
        m = _read_manifest(path)
        if m is not None and m.get("stats"):
            by_name = m["stats"]
            stats = [by_name.get(f.rsplit("/", 1)[-1]) for f in files]
        else:
            stats = [_header_stats(f) for f in files]
        affected = [
            f for f, s in zip(files, stats) if _file_may_match(s, filters)
        ]
    else:
        affected = list(files)
    if not affected:
        return {"parts_total": len(files), "parts_rewritten": 0,
                "rows_deleted": 0, "rows_kept": 0}

    src = _read_avro_files(spark, affected)
    # DELETE semantics: remove only rows where the predicate is TRUE.
    keep = src.filter(~F.coalesce(F.expr(predicate), F.lit(False)))
    n_before = _stats_rows_of_dir(path, affected)
    if n_before is None:
        n_before = src.count()

    bloom_cols = _bloom_cols_of_dir(path, files)
    bits = _BLOOM_BITS_PER_KEY
    uri_mode = "://" in path
    base = path.rstrip("/")
    job = _uuid.uuid4().hex[:12]
    # The rewrites must carry the directory's EXACT writer schema:
    # untouched parts keep theirs, and a reader of the mixed set
    # treats any difference (even DDL-round-trip nullability) as
    # schema drift.  This is the structural difference from
    # compaction, which rewrites EVERY part and may normalize.
    avsc = dir_schema
    new_parts = _write_rows_as_parts(
        keep, avsc, bloom_cols, bits, uri_mode, base, job, codec
    )
    n_kept = sum(n for _, n, _ in new_parts)
    _swap_parts(path, files, affected, new_parts, retain_history, job)

    return {
        "parts_total": len(files),
        "parts_rewritten": len(affected),
        "rows_deleted": int(n_before - n_kept),
        "rows_kept": int(n_kept),
    }


def _write_rows_as_parts(
    df, avsc, bloom_cols, bits, uri_mode, base, job, codec
) -> list[tuple[str, int, str]]:
    """Executor-side part writer for maintenance rewrites: one
    final-named (URI) or temp (local) part per non-empty partition,
    stats+blooms collected, (name, n_rows, stats_json) back to the
    driver — the same per-task shape as AvroOcfWriter.write."""
    out_names = list(df.columns)

    def _write_part(it):
        import uuid as _u

        rows = [{n: r[n] for n in out_names} for r in it]
        if not rows:
            return iter([])
        stats = collect_stats(rows, out_names, bloom_cols, bits)
        meta = {STATS_META_KEY: json.dumps(stats, sort_keys=True).encode()}
        if uri_mode:
            name = f"part-{job}-{_u.uuid4().hex[:8]}.avro"
            write_avro_ocf(f"{base}/{name}", rows, avsc, codec=codec,
                           extra_meta=meta)
            return iter([(name, len(rows), json.dumps(stats, sort_keys=True))])
        tmp = os.path.join(base, f"_tmp_{_u.uuid4().hex}.avro")
        write_avro_ocf(tmp, rows, avsc, codec=codec, extra_meta=meta)
        return iter([(tmp, len(rows), json.dumps(stats, sort_keys=True))])

    return df.rdd.mapPartitions(_write_part).collect()


def _swap_parts(
    path: str,
    files: list[str],
    affected: list[str],
    new_parts: list[tuple[str, int, str]],
    retain_history: bool,
    job: str,
) -> None:
    """Replace `affected` parts with `new_parts` — ONE manifest PUT on
    URI directories (readers see wholly-old or wholly-new;
    retain_history leaves superseded parts for time travel/vacuum);
    rename-then-remove on local classic directories (a crash between
    the two duplicates rows, never loses them)."""
    base = path.rstrip("/")
    affected_names = [f.rsplit("/", 1)[-1] for f in affected]
    if "://" in path:
        def mutate(cur: dict) -> dict:
            parts = [
                p for p in cur.get("parts", []) if p not in set(affected_names)
            ]
            cur["parts"] = sorted(set(parts) | {n for n, _, _ in new_parts})
            _set_manifest_stats(
                cur, {n: json.loads(s) for n, _, s in new_parts}
            )
            return cur

        _publish_manifest(path, mutate)
        if not retain_history:
            for name in affected_names:
                try:
                    _delete_file(f"{base}/{name}")
                except OSError:
                    pass
        return
    for i, (tmp, _, _) in enumerate(new_parts):
        os.replace(tmp, os.path.join(base, f"part-{job}-{i:05d}.avro"))
    for f in affected:
        os.remove(f)


def merge_into_avro_dir(
    spark,
    path: str,
    updates,
    key_cols: list[str],
    prune_filter: str | list | None = None,
    auto_prune_max_keys: int = 10_000,
    codec: str = "null",
    retain_history: bool = False,
) -> dict:
    """MERGE INTO for the lake: rows of ``updates`` whose ``key_cols``
    match an existing row REPLACE it; unmatched keys are INSERTED —
    whole-row upsert semantics (the ``operators/upsert`` batch shape,
    realized as a part-level rewrite).

    Like :func:`delete_where_avro_dir`, cost is proportional to the
    AFFECTED parts: a part is rewritten only when its stats/bloom
    ADMIT one of the update keys.  Pruning is automatic when the
    update's distinct first-key values number at most
    ``auto_prune_max_keys`` (one bounded driver collect builds an IN
    admission test — conservative by construction, so it cannot skip
    a part holding a matched key); larger updates fall back to
    ``prune_filter`` (caller-provided, statsFilter mini-language, must
    be implied by "row's key is in the update set") or to rewriting
    every part.

    Contracts: ``updates`` must carry exactly the directory's columns;
    its keys must be UNIQUE (verified — MERGE with duplicate source
    keys is non-deterministic in every engine, so it is an error
    here); rewrites carry the directory's exact writer schema;
    recursive-typed directories are rejected (compact first).  Commit
    and crash semantics are :func:`delete_where_avro_dir`'s.
    """
    import uuid as _uuid

    register(spark)
    files = _list_avro(path)
    # an EMPTY manifest-managed table merges fine (everything inserts)
    # as long as its schema is known; _schema_of_dir raises otherwise
    dir_schema, dir_fields = _schema_of_dir(path)
    names = [n for n, _, _ in dir_fields]
    if any(is_json for _, _, is_json in dir_fields):
        raise ValueError(
            "merge_into_avro_dir cannot rewrite recursive-typed "
            "(JSON-surfaced) columns part-for-part; compact the "
            "directory first"
        )
    if sorted(updates.columns) != sorted(names):
        raise ValueError(
            f"updates columns {sorted(updates.columns)} != directory "
            f"columns {sorted(names)}"
        )
    missing = sorted(set(key_cols) - set(names))
    if missing:
        raise ValueError(f"key_cols not in directory schema: {missing}")
    if updates.groupBy(*key_cols).count().filter("count > 1").limit(1).count():
        raise ValueError(
            "updates carry duplicate keys — MERGE with a non-unique "
            "source is non-deterministic; deduplicate first"
        )

    filters = None
    if prune_filter is not None:
        raw = prune_filter if isinstance(prune_filter, str) else json.dumps(
            prune_filter
        )
        filters = _parse_stats_filter(raw, names)
    else:
        k0 = key_cols[0]
        vals = [
            r[0]
            for r in updates.select(k0)
            .distinct()
            .limit(auto_prune_max_keys + 1)
            .collect()
        ]
        if len(vals) <= auto_prune_max_keys and all(
            v is not None for v in vals
        ):
            filters = _parse_stats_filter(
                json.dumps([[k0, "in", vals]]), names
            )
    if filters is not None:
        m = _read_manifest(path)
        if m is not None and m.get("stats"):
            by_name = m["stats"]
            stats = [by_name.get(f.rsplit("/", 1)[-1]) for f in files]
        else:
            stats = [_header_stats(f) for f in files]
        affected = [
            f for f, s in zip(files, stats) if _file_may_match(s, filters)
        ]
    else:
        affected = list(files)

    upd = updates.select(*names)
    if affected:
        src = _read_avro_files(spark, affected)
        kept_old = src.join(
            upd.select(*key_cols).distinct(), list(key_cols), "left_anti"
        ).select(*names)
        n_before = _stats_rows_of_dir(path, affected)
        if n_before is None:
            n_before = src.count()
        out = kept_old.unionByName(upd)
    else:
        n_before = 0
        out = upd

    bloom_cols = _bloom_cols_of_dir(path, files)
    uri_mode = "://" in path
    base = path.rstrip("/")
    job = _uuid.uuid4().hex[:12]
    new_parts = _write_rows_as_parts(
        out, dir_schema, bloom_cols, _BLOOM_BITS_PER_KEY, uri_mode, base,
        job, codec,
    )
    n_out = sum(n for _, n, _ in new_parts)
    _swap_parts(path, files, affected, new_parts, retain_history, job)
    n_updates = upd.count()
    return {
        "parts_total": len(files),
        "parts_rewritten": len(affected),
        "rows_matched": int(n_before - (n_out - n_updates)),
        "rows_inserted": int(n_out - n_before)
        if n_out >= n_before
        else 0,
        "rows_written": int(n_out),
    }


def vacuum_avro_dir(path: str, grace_seconds: float = 86400.0) -> list[str]:
    """Delete the invisible debris of a ``kaop_avro`` directory:
    ``_tmp_`` leftovers from crashed local jobs and — on a
    manifest-managed directory — final-named ``.avro`` parts no commit
    ever published (aborted tasks, lost writers, parts superseded by
    an overwrite/compaction whose best-effort delete failed).  Files
    younger than ``grace_seconds`` are kept: an ACTIVE job's parts are
    final-named-but-unpublished for exactly the window between task
    write and driver commit, and the grace keeps vacuum from racing
    it.  Committed parts and the manifest itself are never touched.
    Time-travel snapshots (``_manifest.v*.json``) age out under the
    SAME grace — their parts become vacuumable orphans at exactly that
    age, so a snapshot outliving its parts would only promise reads it
    cannot deliver; the current version's snapshot is always kept.
    Returns the deleted basenames."""
    import time as _time

    m = _read_manifest(path)
    committed = set(m.get("parts", [])) if m is not None else None
    keep_snapshot = (
        _SNAPSHOT_FMT.format(version=int(m["version"]))
        if m is not None and "version" in m
        else None
    )
    now = _time.time()
    deleted: list[str] = []

    def _snapshot_expired(name: str, mtime: float) -> bool:
        return (
            name.startswith("_manifest.v")
            and name.endswith(".json")
            and name != keep_snapshot
            and (now - mtime) >= grace_seconds
        )
    if "://" in path:
        import pyarrow.fs as pafs

        fs, rel = pafs.FileSystem.from_uri(path)
        sel = pafs.FileSelector(rel, allow_not_found=True)
        infos = [
            # unknown mtime -> treat as JUST written (keep): deleting a
            # file whose age we cannot prove would race an active job
            (fi.base_name, fi.mtime.timestamp() if fi.mtime else now, fi.path)
            for fi in fs.get_file_info(sel)
            if fi.is_file
            and (
                fi.base_name.endswith(".avro")
                or fi.base_name.startswith("_manifest.v")
            )
        ]
        for name, mtime, full in sorted(infos):
            orphan = name.startswith("_tmp_") or (
                name.endswith(".avro")
                and committed is not None
                and name not in committed
            )
            expired = (orphan and (now - mtime) >= grace_seconds) or (
                _snapshot_expired(name, mtime)
            )
            if expired:
                try:
                    fs.delete_file(full)
                except OSError:
                    continue
                deleted.append(name)
        return deleted
    import glob as _glob

    candidates = sorted(
        _glob.glob(os.path.join(path, "*.avro"))  # incl. _tmp_*
        + _glob.glob(os.path.join(path, "_manifest.v*.json"))
    )
    for f in candidates:
        name = os.path.basename(f)
        orphan = name.startswith("_tmp_") or (
            name.endswith(".avro")
            and committed is not None
            and name not in committed
        )
        try:
            mtime = os.path.getmtime(f)
            expired = (orphan and (now - mtime) >= grace_seconds) or (
                _snapshot_expired(name, mtime)
            )
            if not expired:
                continue
            os.remove(f)
        except OSError:
            continue
        deleted.append(name)
    return deleted
