"""Prometheus remote-write ingestion: WriteRequest protobuf → metrics rows.

The reference hand-rolls the protobuf wire-format parse (no prost codegen)
and routes each sample's value to f64/i64/u64 by integer losslessness
(reference ``api/ingest/prometheus.rs:89-345, 405-430``); ``__name__``
becomes ``metric_name`` and every other label a column
(``api/ingest/prometheus.rs:356-460``).

Wire format parsed here (public Prometheus remote-write proto):

    WriteRequest { repeated TimeSeries timeseries = 1; }
    TimeSeries   { repeated Label labels = 1; repeated Sample samples = 2; }
    Label        { string name = 1; string value = 2; }
    Sample       { double value = 1; int64 timestamp = 2; }  // ms epoch

Decode runs in ``mapInPandas`` (Arrow-batched, streamed) because protobuf
bytes are opaque to Catalyst. This is the documented slow path: one Python
pass at ingest, after which everything is columnar. On a JVM-library
deployment you would swap this for ``from_protobuf`` with a descriptor set
— same output contract. Payloads may be snappy-compressed (the protocol
default); decompression is attempted when the ``snappy``/``cramjam``
modules exist, else raw protobuf is assumed.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cardinalsin_spark.sources.ingest import route_value_types

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

FLAT_SCHEMA = "ts_ms long, metric_name string, value double, labels map<string,string>"


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    out = 0
    n = len(buf)
    while True:
        if i >= n:
            raise ValueError("truncated varint")
        if shift > 63:  # int64 varints are ≤10 bytes; anything longer is junk
            raise ValueError("varint overflow")
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _fields(buf: bytes) -> Iterator[tuple[int, int, bytes | int]]:
    """Walk a protobuf message: yields (field_no, wire_type, value) where
    value is bytes for length-delimited (2), int for varint (0), raw 8
    bytes for fixed64 (1). Raises ValueError on truncated or malformed
    input instead of silently yielding short slices."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        field_no, wt = key >> 3, key & 0x07
        if wt == 0:
            v, i = _read_varint(buf, i)
            yield field_no, wt, v
        elif wt == 1:
            if i + 8 > n:
                raise ValueError("truncated fixed64")
            yield field_no, wt, buf[i : i + 8]
            i += 8
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            if ln < 0 or i + ln > n:
                raise ValueError("truncated length-delimited field")
            yield field_no, wt, buf[i : i + ln]
            i += ln
        elif wt == 5:
            if i + 4 > n:
                raise ValueError("truncated fixed32")
            yield field_no, wt, buf[i : i + 4]
            i += 4
        else:  # groups are long-deprecated
            raise ValueError(f"unsupported wire type {wt}")


def _maybe_decompress(payload: bytes) -> bytes:
    try:
        import snappy  # type: ignore[import-not-found]

        try:
            return snappy.uncompress(payload)
        except Exception:
            return payload
    except ImportError:
        pass
    try:
        import cramjam  # type: ignore[import-not-found]

        try:
            return bytes(cramjam.snappy.decompress_raw(payload))
        except Exception:
            return payload
    except ImportError:
        return payload


def decode_write_request(payload: bytes) -> list[tuple[int, str, float, dict]]:
    """One WriteRequest → [(ts_ms, metric_name, value, labels), ...]."""
    rows = []
    buf = _maybe_decompress(payload)
    for fno, wt, ts_bytes in _fields(buf):
        if fno != 1 or wt != 2:  # timeseries is length-delimited; a varint
            continue  # numbered 1 would otherwise be sliced as a message
        labels: dict[str, str] = {}
        samples: list[tuple[float, int]] = []
        for sfno, swt, sval in _fields(ts_bytes):
            if sfno == 1 and swt == 2:  # Label
                name = value = ""
                for lfno, lwt, lval in _fields(sval):
                    if lfno == 1 and lwt == 2:
                        name = lval.decode("utf-8")
                    elif lfno == 2 and lwt == 2:
                        value = lval.decode("utf-8")
                labels[name] = value
            elif sfno == 2 and swt == 2:  # Sample
                v = 0.0
                ts = 0
                for pfno, pwt, pval in _fields(sval):
                    if pfno == 1 and pwt == 1:
                        v = struct.unpack("<d", pval)[0]
                    elif pfno == 2 and pwt == 0:
                        # zigzag not used: sint64 isn't in the proto; int64
                        # negatives arrive as 10-byte varints (two's compl.)
                        ts = pval - (1 << 64) if pval >= 1 << 63 else pval
                samples.append((v, ts))
        metric = labels.pop("__name__", "")
        for v, ts in samples:
            rows.append((ts, metric, v, dict(labels)))
    return rows


def _decode_sample(buf: bytes) -> tuple[float, int]:
    v = 0.0
    ts = 0
    for fno, wt, val in _fields(buf):
        if fno == 1 and wt == 1:
            v = struct.unpack("<d", val)[0]
        elif fno == 2 and wt == 0:
            ts = val - (1 << 64) if val >= 1 << 63 else val
    return v, ts


def decode_write_request_v2(payload: bytes) -> list[tuple[int, str, float, dict]]:
    """Remote-write 2.0 (``io.prometheus.write.v2.Request``, the current
    public spec) → the same flat rows as the v1 decoder. The 2.0 format
    string-interns every label into a request-level ``symbols`` table
    (field 4; ``symbols[0]`` is ""), and each series carries packed
    ``labels_refs`` pairs (name_ref, value_ref — field 1) instead of
    Label messages; samples are unchanged. Native-histogram series
    (field 4 inside TimeSeries) are beyond this adapter — their SAMPLES
    simply don't exist, so they decode to nothing rather than to wrong
    rows; classic histograms arrive as ordinary ``_bucket``/``_sum``/
    ``_count`` series and work as in v1. The reference supports only v1
    (``api/ingest/prometheus.rs``)."""
    buf = _maybe_decompress(payload)
    symbols: list[str] = []
    series_bufs: list[bytes] = []
    for fno, wt, val in _fields(buf):
        if fno == 4 and wt == 2:
            symbols.append(val.decode("utf-8"))
        elif fno == 5 and wt == 2:
            series_bufs.append(val)
    rows: list[tuple[int, str, float, dict]] = []
    for ts_buf in series_bufs:
        refs: list[int] = []
        samples: list[tuple[float, int]] = []
        for fno, wt, val in _fields(ts_buf):
            if fno == 1 and wt == 2:  # packed uint32 refs
                i = 0
                while i < len(val):
                    r, i = _read_varint(val, i)
                    refs.append(r)
            elif fno == 1 and wt == 0:  # unpacked straggler
                refs.append(val)
            elif fno == 2 and wt == 2:
                samples.append(_decode_sample(val))
        if len(refs) % 2:
            raise ValueError(
                f"odd labels_refs length {len(refs)} (must be name/value pairs)"
            )
        labels: dict[str, str] = {}
        for j in range(0, len(refs), 2):
            labels[symbols[refs[j]]] = symbols[refs[j + 1]]
        metric = labels.pop("__name__", "")
        for v, ts in samples:
            rows.append((ts, metric, v, dict(labels)))
    return rows


def _looks_like_v2(buf: bytes) -> bool:
    """Protocol sniff for ``version="auto"``: a v1 WriteRequest carries
    field 1 (timeseries); a 2.0 Request has no field 1 at all — its
    content lives in fields 4 (symbols) and 5 (timeseries). The field
    sets are disjoint, so the first recognised field number decides."""
    for fno, wt, _ in _fields(buf):
        if fno == 1 and wt == 2:
            return False
        if fno in (4, 5) and wt == 2:
            return True
    return False


def remote_write_flatten(
    payloads: DataFrame,
    bytes_col: str = "payload",
    on_error: str = "skip",
    version: str | int = 1,
) -> DataFrame:
    """binary WriteRequest payloads → (ts_ms, metric_name, value, labels).

    Decode failures are isolated per payload: one malformed/truncated
    WriteRequest must not fail the whole ingest job (the reference returns
    a per-request 400 and keeps serving, ``api/ingest/prometheus.rs``).
    ``on_error="skip"`` (default) drops bad payloads and counts them in the
    ``rw_decode_errors`` Spark accumulator; ``on_error="raise"`` propagates.

    ``version`` selects the wire protocol: ``1`` (default, the
    reference's only format), ``2`` (remote-write 2.0 symbol-table
    format), or ``"auto"`` to sniff per payload (the field sets are
    disjoint, so the sniff cannot misroute a well-formed request).
    """
    if on_error not in ("skip", "raise"):
        raise ValueError(f"on_error must be 'skip' or 'raise', got {on_error!r}")
    if version not in (1, 2, "auto"):
        raise ValueError(f"version must be 1, 2 or 'auto', got {version!r}")
    acc = payloads.sparkSession.sparkContext.accumulator(0)

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows: list[tuple] = []
            for payload in pdf[bytes_col]:
                try:
                    raw = bytes(payload)
                    if version == 2:
                        rows.extend(decode_write_request_v2(raw))
                    elif version == "auto":
                        if _looks_like_v2(_maybe_decompress(raw)):
                            rows.extend(decode_write_request_v2(raw))
                        else:
                            rows.extend(decode_write_request(raw))
                    else:
                        rows.extend(decode_write_request(raw))
                except (ValueError, UnicodeDecodeError, struct.error, IndexError):
                    if on_error == "raise":
                        raise
                    acc.add(1)
            yield pd.DataFrame(
                rows, columns=["ts_ms", "metric_name", "value", "labels"]
            )

    return payloads.select(bytes_col).mapInPandas(fn, FLAT_SCHEMA)


def remote_write_to_metrics(
    payloads: DataFrame,
    label_keys: list[str] | None = None,
    bytes_col: str = "payload",
    version: str | int = 1,
) -> DataFrame:
    """Full remote-write ingest: decode, pivot labels to columns, route
    value types (f64/i64/u64 by losslessness, like the reference).
    ``version`` as in :func:`remote_write_flatten` (1, 2 or "auto")."""
    flat = remote_write_flatten(payloads, bytes_col, version=version)
    if label_keys is None:
        label_keys = sorted(
            r[0]
            for r in flat.select(F.explode(F.map_keys("labels")).alias("k"))
            .distinct()
            .collect()
        )
    out = flat.select(
        F.timestamp_millis(F.col("ts_ms")).alias("timestamp"),
        (F.col("ts_ms") * 1_000_000).alias("ts_ns"),
        "metric_name",
        "value",
        *[F.col("labels").getItem(k).alias(k) for k in label_keys],
    )
    return route_value_types(out).drop("value")
