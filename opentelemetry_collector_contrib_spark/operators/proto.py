"""fileexporter ``format: proto`` — OTLP/protobuf log encoding.

The reference fileexporter marshals each batch as an OTLP protobuf
message and writes it length-delimited to ``.binpb`` files
(exporter/fileexporter/config.go:22-52 ``format: proto``;
file_writer.go export loop). This container has no protobuf runtime, so
the wire bytes are assembled directly from the PUBLIC protobuf wire
spec + the public opentelemetry-proto schema (logs/v1/logs.proto):

  LogsData{ resource_logs=1 } / ResourceLogs{ resource=1, scope_logs=2 }
  / Resource{ attributes=1 } / ScopeLogs{ scope=1, log_records=2 }
  / InstrumentationScope{ name=1, version=2 }
  / LogRecord{ time_unix_nano=1 fixed64, severity_number=2 varint,
      severity_text=3, body=5, attributes=6 }
  / KeyValue{ key=1, value=2 } / AnyValue oneof{ string=1, bool=2,
      int=3, double=4, bytes=7 }

Execution shape: encoding runs in ``mapInPandas`` (Arrow batches in,
bytes out) — message assembly is inherently per-record byte work, the
same shape as the reference's own per-batch marshal, and sits on the
EXPORT path, not in analytics hot loops. Files are written per
partition, each record's message varint-length-delimited, mirroring the
reference's framing so a collector-side ``plog`` unmarshal loop can
consume them.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = ["encode_logs_proto", "write_proto_files", "decode_logs_proto"]


def _isnull(v) -> bool:
    # pandas nulls from numeric/datetime Arrow columns arrive as
    # NaN/NaT, not None — those must be OMITTED from OTLP attributes,
    # not serialized as literal "nan"/"NaT" strings.  pd.isna on a
    # non-scalar (list/array attr value) returns an array; guard it.
    if v is None:
        return True
    try:
        return bool(pd.isna(v))
    except (TypeError, ValueError):
        return False


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


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _str_field(field: int, s: str | None) -> bytes:
    if not s:
        return b""
    return _len_field(field, s.encode("utf-8"))


def _anyvalue(s: str | None = None, i: int | None = None) -> bytes:
    if s is not None:
        return _str_field(1, s)
    if i is not None:
        return _tag(3, 0) + _varint(i & ((1 << 64) - 1))
    return b""


def _keyvalue(key: str, value_payload: bytes) -> bytes:
    return _len_field(1, key.encode("utf-8")) + _len_field(2, value_payload)


def _log_record(
    ts_nano: int | None,
    severity_number: int | None,
    severity_text: str | None,
    body: str | None,
    attrs: dict | None,
) -> bytes:
    out = bytearray()
    if ts_nano:
        out += _tag(1, 1) + struct.pack("<Q", ts_nano)
    if severity_number:
        out += _tag(2, 0) + _varint(severity_number)
    out += _str_field(3, severity_text)
    if body is not None:
        out += _len_field(5, _anyvalue(s=body))
    for k, v in (attrs or {}).items():
        if _isnull(v):
            continue
        out += _len_field(6, _keyvalue(k, _anyvalue(s=str(v))))
    return bytes(out)


def _logs_data(
    record: bytes, resource_attrs: dict | None, scope_name: str
) -> bytes:
    resource = b"".join(
        _len_field(1, _keyvalue(k, _anyvalue(s=str(v))))
        for k, v in (resource_attrs or {}).items()
        if not _isnull(v)
    )
    scope = _str_field(1, scope_name)
    scope_logs = _len_field(1, scope) + _len_field(2, record)
    resource_logs = _len_field(1, resource) + _len_field(2, scope_logs)
    return _len_field(1, resource_logs)


def encode_logs_proto(
    df: DataFrame,
    *,
    body_col: str = "text",
    ts_col: str | None = "ts",
    severity_text_col: str | None = None,
    severity_number_col: str | None = None,
    attr_cols: list[str] | None = None,
    resource_attr_cols: list[str] | None = None,
    scope_name: str = "opentelemetry_collector_contrib_spark",
) -> DataFrame:
    """Encode each row as one OTLP ``LogsData`` protobuf message (binary
    column ``proto``). One record per message mirrors the granularity
    the routed-write path needs; a collector unmarshals each frame with
    the standard plog proto unmarshaler."""
    attr_cols = attr_cols or []
    resource_attr_cols = resource_attr_cols or []
    cols = [body_col] + attr_cols + resource_attr_cols
    if ts_col:
        cols.append(ts_col)
    if severity_text_col:
        cols.append(severity_text_col)
    if severity_number_col:
        cols.append(severity_number_col)
    src = df.select(*dict.fromkeys(cols))

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            protos = []
            if ts_col is None:
                ts_vals = None
            elif pd.api.types.is_datetime64_any_dtype(b[ts_col]):
                ts_vals = b[ts_col].astype("datetime64[ns]").astype("int64")
            else:
                ts_vals = pd.to_numeric(b[ts_col], errors="coerce")
            for idx in range(len(b)):
                row = b.iloc[idx]
                # null timestamp (NaT -> int64 min / NaN) omits the field
                ts_nano = None
                if ts_vals is not None:
                    raw_ts = ts_vals.iloc[idx]
                    if pd.notna(raw_ts) and int(raw_ts) > 0:
                        ts_nano = int(raw_ts)
                rec = _log_record(
                    ts_nano,
                    int(row[severity_number_col])
                    if severity_number_col and pd.notna(row[severity_number_col])
                    else None,
                    row[severity_text_col] if severity_text_col else None,
                    row[body_col] if pd.notna(row[body_col]) else None,
                    {k: row[k] for k in attr_cols},
                )
                protos.append(
                    _logs_data(
                        rec,
                        {k: row[k] for k in resource_attr_cols},
                        scope_name,
                    )
                )
            yield pd.DataFrame({"proto": protos})

    return src.mapInPandas(encode, schema=T.StructType(
        [T.StructField("proto", T.BinaryType())]
    ))


def write_proto_files(df: DataFrame, path: str, *, proto_col: str = "proto") -> int:
    """Write varint-length-delimited ``.binpb`` files, one per partition
    (the fileexporter's framing, file_writer.go). Uses the executor-local
    filesystem API against ``path`` — on a cluster, point it at a shared
    mount; object stores want the committer-based sinks instead (the
    parquet/json paths of ``write_routed``). Overwrite semantics: stale
    ``.binpb`` files from earlier runs are cleared first (there is no
    committer on this raw-file path). Returns the file count."""
    os.makedirs(path, exist_ok=True)
    for old in os.listdir(path):
        if old.endswith(".binpb"):
            os.remove(os.path.join(path, old))

    def write_partition(rows):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        target = os.path.join(path, f"part-{pid:05d}.binpb")
        n = 0
        with open(target, "wb") as f:
            for r in rows:
                payload = bytes(r[proto_col])
                f.write(_varint(len(payload)))
                f.write(payload)
                n += 1
        if n == 0:
            os.remove(target)

    df.select(proto_col).rdd.foreachPartition(write_partition)
    return len([f for f in os.listdir(path) if f.endswith(".binpb")])


# ---------------------------------------------------------------------------
# minimal decoder — test/verification aid (the consumer of these files is
# the collector's own plog unmarshaler; this mirrors just enough of it to
# assert round-trips without a protobuf runtime)
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = buf[i]
        n |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return n, i
        shift += 7


def _fields(buf: bytes) -> Iterator[tuple[int, int, bytes | int]]:
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _read_varint(buf, i)
            yield field, wire, v
        elif wire == 1:
            yield field, wire, struct.unpack("<Q", buf[i : i + 8])[0]
            i += 8
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            yield field, wire, buf[i : i + ln]
            i += ln
        else:  # pragma: no cover - wire 5 unused by this schema
            yield field, wire, struct.unpack("<I", buf[i : i + 4])[0]
            i += 4


def _dec_anyvalue(buf: bytes):
    for f, _, v in _fields(buf):
        if f == 1:
            return v.decode("utf-8")
        if f == 3:
            return v
    return None


def _dec_keyvalue(buf: bytes) -> tuple[str, object]:
    key = val = None
    for f, _, v in _fields(buf):
        if f == 1:
            key = v.decode("utf-8")
        elif f == 2:
            val = _dec_anyvalue(v)
    return key, val


def decode_logs_proto(path: str) -> list[dict]:
    """Parse every ``.binpb`` frame back into flat dicts."""
    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".binpb"):
            continue
        buf = open(os.path.join(path, name), "rb").read()
        i = 0
        while i < len(buf):
            ln, i = _read_varint(buf, i)
            msg = buf[i : i + ln]
            i += ln
            rec: dict = {"resource": {}, "attrs": {}}
            for f1, _, rl in _fields(msg):
                if f1 != 1:
                    continue
                for f2, _, v2 in _fields(rl):
                    if f2 == 1:  # resource
                        for f3, _, v3 in _fields(v2):
                            if f3 == 1:
                                k, v = _dec_keyvalue(v3)
                                rec["resource"][k] = v
                    elif f2 == 2:  # scope_logs
                        for f3, _, v3 in _fields(v2):
                            if f3 == 1:
                                for f4, _, v4 in _fields(v3):
                                    if f4 == 1:
                                        rec["scope"] = v4.decode("utf-8")
                            elif f3 == 2:  # log_record
                                for f4, w4, v4 in _fields(v3):
                                    if f4 == 1:
                                        rec["ts"] = v4
                                    elif f4 == 2:
                                        rec["severity_number"] = v4
                                    elif f4 == 3:
                                        rec["severity_text"] = v4.decode()
                                    elif f4 == 5:
                                        rec["body"] = _dec_anyvalue(v4)
                                    elif f4 == 6:
                                        k, v = _dec_keyvalue(v4)
                                        rec["attrs"][k] = v
            out.append(rec)
    return out
