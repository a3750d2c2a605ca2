"""Property-based tests (hypothesis) for the remote-write protobuf
wire-format parser: any encodable WriteRequest decodes back exactly.
Pure Python — no Spark session needed."""

from __future__ import annotations

import math
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from cardinalsin_spark.sources.remote_write import (
    _fields,
    _read_varint,
    decode_write_request,
)
from tests.test_ingest_adapters import _varint, _write_request

label_names = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x24F),
    min_size=1,
    max_size=12,
)
label_values = st.text(min_size=0, max_size=24)
finite_doubles = st.floats(allow_nan=False, allow_infinity=False, width=64)
ts_millis = st.integers(min_value=-(2**62), max_value=2**62)


@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_varint_roundtrip(n):
    out, idx = _read_varint(_varint(n), 0)
    assert out == n and idx == len(_varint(n))


@given(
    st.lists(
        st.tuples(
            st.dictionaries(label_names, label_values, max_size=5),
            st.lists(st.tuples(finite_doubles, ts_millis), max_size=5),
        ),
        max_size=5,
    )
)
@settings(max_examples=200, deadline=None)
def test_write_request_roundtrip(series):
    # give every series a metric name (the parser pops __name__)
    named = [({"__name__": "m", **labels}, samples) for labels, samples in series]
    rows = decode_write_request(_write_request(named))
    expected = [
        (ts, "m", v, {k: val for k, val in labels.items()})
        for labels, samples in series
        for v, ts in samples
    ]
    assert len(rows) == len(expected)
    for (ts, name, v, labels), (ets, ename, ev, elabels) in zip(rows, expected):
        assert (ts, name, labels) == (ets, ename, elabels)
        assert v == ev or (math.isnan(v) and math.isnan(ev)) or struct.pack(
            "<d", v
        ) == struct.pack("<d", ev)


@given(st.binary(max_size=64))
def test_field_walker_never_reads_past_buffer(buf):
    """Arbitrary bytes either parse or raise cleanly — no infinite loops,
    no negative indexes."""
    try:
        for fno, wt, val in _fields(buf):
            assert fno >= 0
    except (IndexError, ValueError):
        pass  # malformed input is allowed to raise


# --- OTLP ExportMetricsServiceRequest round-trip ----------------------------


metric_names = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x24F),
    min_size=1,
    max_size=12,
)
ts_nanos = st.integers(min_value=0, max_value=2**62)


@given(
    st.dictionaries(label_names, label_values, max_size=3),
    st.lists(
        st.tuples(metric_names, ts_nanos, finite_doubles),
        min_size=0,
        max_size=5,
    ),
)
@settings(max_examples=200, deadline=None)
def test_otlp_export_request_roundtrip(resource_attrs, gauges):
    """Any encodable gauge request decodes back exactly: names, ns
    timestamps, double bit patterns, resource-attr merge."""
    from cardinalsin_spark.sources.otlp import decode_export_metrics_request
    from tests.test_ingest_adapters import (
        _any_string,
        _export_request,
        _metric,
        _number_point,
    )

    payload = _export_request(
        [(k, _any_string(v)) for k, v in resource_attrs.items()],
        [
            _metric(name, 5, [_number_point(ts, as_double=v)])
            for name, ts, v in gauges
        ],
    )
    rows = decode_export_metrics_request(payload)
    assert len(rows) == len(gauges)
    for (ts, name, v, labels), (ename, ets, ev) in zip(rows, gauges):
        assert (ts, name) == (ets, ename)
        assert struct.pack("<d", v) == struct.pack("<d", ev)
        assert labels == dict(resource_attrs)


@given(st.integers(min_value=0, max_value=2**64 - 1), st.booleans())
@settings(max_examples=100, deadline=None)
def test_otlp_histogram_collapse_property(count, has_sum):
    """Histogram points collapse to sum when present, else count — for any
    fixed64 count and any sum presence."""
    from cardinalsin_spark.sources.otlp import decode_export_metrics_request
    from tests.test_ingest_adapters import _export_request, _histo_point, _metric

    s = 123.25 if has_sum else None
    payload = _export_request(
        [], [_metric("h", 9, [_histo_point(1, count=count, s=s)])]
    )
    (row,) = decode_export_metrics_request(payload)
    assert row[2] == (123.25 if has_sum else float(count))


@given(st.binary(max_size=96))
@settings(max_examples=300, deadline=None)
def test_otlp_decoder_never_crashes_unexpectedly(buf):
    """Arbitrary bytes either decode to rows or raise the documented
    error types — never hang, index-error, or partially mutate state."""
    from cardinalsin_spark.sources.otlp import decode_export_metrics_request

    try:
        rows = decode_export_metrics_request(buf)
    except (ValueError, UnicodeDecodeError, struct.error):
        return
    for ts, name, value, labels in rows:
        assert isinstance(ts, int)
        assert isinstance(name, str)
        assert isinstance(labels, dict)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(0, 1000), min_size=1, max_size=9),
    st.lists(st.integers(1, 10_000), min_size=2, max_size=10, unique=True),
)
def test_otlp_histogram_bucket_expansion_properties(counts, raw_bounds):
    """Wire-decode property over random classic histograms: cumulative
    bucket rows are monotone non-decreasing in le, the +Inf row equals
    the point's count (or the bucket total when count is absent), and
    every bound appears exactly once."""
    from cardinalsin_spark.sources.otlp import decode_export_metrics_request
    from tests.test_ingest_adapters import (
        _export_request,
        _histo_point_buckets,
        _metric,
    )

    bounds = sorted(float(b) for b in raw_bounds)[: max(1, len(counts) - 1)]
    counts = counts[: len(bounds) + 1]
    total = sum(counts)
    payload = _export_request(
        [],
        [
            _metric(
                "h", 9,
                [
                    _histo_point_buckets(
                        1_000, count=total, s=None,
                        counts=counts, bounds=bounds,
                    )
                ],
            )
        ],
    )
    rows = decode_export_metrics_request(payload, histogram_buckets=True)
    buckets = [(r[3]["le"], r[2]) for r in rows if r[1] == "h_bucket"]
    finite = [b for b in buckets if b[0] != "+Inf"]
    assert len(finite) == len(bounds)
    cums = [v for _, v in finite]
    assert cums == sorted(cums)  # cumulative is monotone
    inf = [v for le, v in buckets if le == "+Inf"]
    assert inf == [float(total) if total else float(sum(counts))]
    count_row = [r[2] for r in rows if r[1] == "h_count"]
    assert count_row == inf
    # prefix-sum correctness against the raw counts
    import itertools

    expect = list(itertools.accumulate(counts[: len(bounds)]))
    assert cums == [float(c) for c in expect]


@settings(max_examples=100, deadline=None)
@given(
    st.integers(-4, 8),
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(1, 4)),
        min_size=1,
        max_size=4,
    ),
    st.data(),
)
def test_native_histogram_expansion_property(schema, spans, data):
    """Random native histograms (write.v2 field 3): the exp-bucket rows
    carry exactly the span-expanded NON-cumulative counts at otlp idx =
    native idx - 1, zero/count/sum rows agree, and the identical message
    through prompb field 4 (v1) yields the same row set."""
    from cardinalsin_spark.sources.remote_write import (
        decode_write_request_v2,
    )
    from tests.test_ingest_adapters import (
        _label,
        _ld,
        _native_histogram,
        _v2_with_histogram,
    )

    nbuckets = sum(length for _, length in spans)
    counts = data.draw(
        st.lists(
            st.integers(0, 100), min_size=nbuckets, max_size=nbuckets
        )
    )
    deltas = [counts[0]] + [
        counts[i] - counts[i - 1] for i in range(1, len(counts))
    ]
    zero = data.draw(st.integers(0, 50))
    h = _native_histogram(
        schema=schema, zero=zero, pos_spans=spans, pos_deltas=deltas,
        ts_ms=777,
    )
    rows = decode_write_request_v2(_v2_with_histogram({"__name__": "m"}, h))
    # independent span walk: absolute native index per bucket
    expect: dict[str, float] = {}
    idx = 0
    j = 0
    for off, length in spans:
        idx += off
        for _ in range(length):
            if counts[j]:
                expect[str(idx - 1)] = float(counts[j])
            j += 1
            idx += 1
    got = {
        r[3]["idx"]: r[2] for r in rows if r[1] == "m_exp_bucket"
    }
    assert got == expect
    for r in rows:
        if r[1] == "m_exp_bucket":
            assert r[3]["scale"] == str(schema) and r[3]["sign"] == "pos"
        assert r[0] == 777
    assert [r[2] for r in rows if r[1] == "m_exp_zero"] == [float(zero)]
    # count omitted on the wire -> derived zero + bucket total
    assert [r[2] for r in rows if r[1] == "m_count"] == [
        float(zero + sum(counts))
    ]
    # v1 twin: same Histogram message on prompb field 4
    from cardinalsin_spark.sources.remote_write import decode_write_request

    v1 = decode_write_request(
        _ld(1, _ld(1, _label("__name__", "m")) + _ld(4, h))
    )
    key = lambda r: (r[0], r[1], r[2], tuple(sorted(r[3].items())))  # noqa: E731
    assert sorted(map(key, v1)) == sorted(map(key, rows))


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.floats(0.001, 1e6, allow_nan=False, allow_infinity=False),
        min_size=1, max_size=6, unique=True,
    ),
    st.data(),
)
def test_nhcb_decode_property(raw_bounds, data):
    """Random NHCB histograms (schema -53 + custom_values): decoded
    ``{m}_bucket`` rows are the CUMULATIVE sums of the span-expanded
    counts over the sorted bounds plus a +Inf total, count/sum rows
    agree, and prompb field 4 (v1) yields the same row set."""
    import itertools

    from cardinalsin_spark.sources.remote_write import (
        decode_write_request,
        decode_write_request_v2,
    )
    from tests.test_ingest_adapters import (
        _label,
        _ld,
        _native_histogram,
        _v2_with_histogram,
    )

    bounds = sorted(raw_bounds)
    n = len(bounds) + 1  # + the +Inf overflow bucket
    counts = data.draw(st.lists(st.integers(0, 100), min_size=n, max_size=n))
    deltas = [counts[0]] + [
        counts[i] - counts[i - 1] for i in range(1, len(counts))
    ]
    h = _native_histogram(
        s=1.5, schema=-53, pos_spans=[(0, n)], pos_deltas=deltas,
        ts_ms=777, custom_values=bounds,
    )
    rows = decode_write_request_v2(_v2_with_histogram({"__name__": "m"}, h))
    from cardinalsin_spark.sources.otlp import _fmt_le

    cums = list(itertools.accumulate(counts))
    expect = {
        _fmt_le(b): float(c) for b, c in zip(bounds, cums[:-1])
    }
    expect["+Inf"] = float(cums[-1])
    got = {r[3]["le"]: r[2] for r in rows if r[1] == "m_bucket"}
    assert got == expect
    assert [r[2] for r in rows if r[1] == "m_count"] == [float(cums[-1])]
    assert [r[2] for r in rows if r[1] == "m_sum"] == [1.5]
    for r in rows:
        assert r[0] == 777 and "scale" not in r[3]
    v1 = decode_write_request(
        _ld(1, _ld(1, _label("__name__", "m")) + _ld(4, h))
    )
    key = lambda r: (r[0], r[1], r[2], tuple(sorted(r[3].items())))  # noqa: E731
    assert sorted(map(key, v1)) == sorted(map(key, rows))
