"""PromQL → DataFrame transpiler.

Re-implements the reference's regex-shaped PromQL support (reference
``api/query/prometheus_api.rs:744-826`` parse, ``877-935`` instant transpile,
``938-1087`` range transpile) against a metrics-shaped DataFrame instead of a
SQL string. Supported grammar (exactly the reference's):

- aggregation: ``agg [by (l1,l2)] (inner)`` for
  sum/avg/count/min/max/stddev/stdvar/topk/bottomk — plus (beyond the
  reference) ``quantile(φ, inner)`` and ``count_values("lbl", inner)``
- range functions: ``fn(selector[Nu])`` for rate/increase/irate/delta/
  idelta/deriv, units s/m/h/d — plus (beyond the reference) the
  ``*_over_time`` family (sum/avg/min/max/count/stddev/stdvar/last) and
  the full binary-operator set between vector expressions with
  ``on()/ignoring()/group_left`` matching: arithmetic ``+ - * / %``
  (oracle tier) and ``^``/``atan2`` (libm convenience tier), comparisons
  with ``bool``, set ops ``and/or/unless``
- selector: ``metric_name{label op "value", ...}`` with ops = != =~ !~,
  with an optional ``offset Nu`` modifier (beyond the reference)
- wrappers (beyond the reference): ``label_replace(v, dst, repl, src, re)``,
  ``label_join(v, dst, sep, src...)``, ``absent(selector)`` (instant)
- subqueries (beyond the reference, range AND instant queries):
  ``fn_over_time(expr[W:R])`` for the over_time family, and range
  functions OVER a subquery ``rate|increase|delta(expr[W:R])`` (inner
  grid at R, the reference's MAX−MIN form per outer W bucket — or per
  series over [time−W, time] for an instant query; irate/idelta/deriv
  and faithful variants loud-reject — the inner grid erases raw sample
  spacing)
- fail-loudly: residue no grammar branch recognizes raises ``ValueError``
  — including the leaf name-fallback, which only accepts metric-name-
  shaped strings (an expression-looking fallthrough used to silently
  filter on a nonsense name and return empty)

Deviations from the reference (documented, deliberate):
- ``topk``/``bottomk`` take their k argument and apply a real LIMIT
  (the reference degrades them to plain aggregation with no limit,
  ``api/query/prometheus_api.rs:757``).
- instant selector queries break timestamp ties deterministically when a
  ``tiebreak`` column is given (the reference's ``LIMIT 1`` is
  nondeterministic under ties).

Execution shape: everything compiles to filter → groupBy → agg over built-in
functions, so Catalyst pushes the metric_name/label/time predicates into the
parquet scan — the Spark-native equivalent of the reference's chunk pruning.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cardinalsin_spark.functions.core import label_matcher, time_bucket
from cardinalsin_spark.operators.timeseries import MetricsCols

_AGG_RE = re.compile(
    r"^(sum|avg|count|min|max|stddev|stdvar|topk|bottomk|quantile|count_values"
    r"|group)"
    r"\s*(?:(by|without)\s*\(([^)]+)\))?\s*\((.+)\)$",
    re.DOTALL,
)
_RANGE_FN_RE = re.compile(
    r"^(rate|increase|irate|delta|idelta|deriv|resets|changes"
    r"|(?:sum|avg|min|max|count|stddev|stdvar|last|present|mad)_over_time)"
    r"\s*\((.+)\[(\d+)([smhd])\]\)$",
    re.DOTALL,
)
# predict_linear carries a trailing horizon argument in seconds:
# predict_linear(m[1h], 1800)
_PREDICT_RE = re.compile(
    r"^predict_linear\s*\((.+)\[(\d+)([smhd])\]\s*,\s*(\d+)\s*\)$", re.DOTALL
)
# subquery: fn_over_time(expr[W:R]) — evaluate expr at resolution R,
# aggregate the inner points per outer W bucket (tumbling two-level
# evaluation, consistent with this transpiler's bucket model; Prometheus
# evaluates sliding windows per eval point — documented deviation shared
# with every other range shape here)
_SUBQ_RE = re.compile(
    r"^(sum|avg|min|max|count|stddev|last)_over_time"
    r"\s*\(\s*(.+)\[(\d+)([smhd]):(?:(\d+)([smhd]))?\]\s*\)$",
    re.DOTALL,
)
# range function over a subquery: rate(expr[W:R]) — evaluate expr at
# resolution R, apply the reference's MAX−MIN function per outer W bucket
# (rate/increase/delta only; the last-two-samples / least-squares family
# needs raw sample spacing that the inner grid has erased — loud reject)
_SUBQ_FN_RE = re.compile(
    r"^(rate|irate|increase|delta|idelta|deriv)"
    r"\s*\(\s*(.+)\[(\d+)([smhd]):(?:(\d+)([smhd]))?\]\s*\)$",
    re.DOTALL,
)
# quantile_over_time carries a leading quantile argument:
# quantile_over_time(0.9, m[1h])
_QOT_RE = re.compile(
    r"^quantile_over_time\s*\(\s*([0-9]*\.?[0-9]+)\s*,"
    r"\s*(.+)\[(\d+)([smhd])\]\s*\)$",
    re.DOTALL,
)
# holt_winters / double_exponential_smoothing carries level + trend factors:
# holt_winters(m[1h], 0.3, 0.3)
_HW_RE = re.compile(
    r"^(?:holt_winters|double_exponential_smoothing)"
    r"\s*\((.+)\[(\d+)([smhd])\]\s*,"
    r"\s*([0-9]*\.?[0-9]+)\s*,\s*([0-9]*\.?[0-9]+)\s*\)$",
    re.DOTALL,
)
# histogram_quantile carries a leading quantile argument and evaluates over
# a cumulative-bucket family carrying an `le` label:
# histogram_quantile(0.9, m_bucket)
_HISTQ_RE = re.compile(
    r"^histogram_quantile\s*\(\s*([0-9]*\.?[0-9]+)\s*,\s*(.+)\)$", re.DOTALL
)
# histogram_fraction(lo, hi, m_bucket): estimated fraction of observations
# in (lo, hi] over the same cumulative-bucket family
_HISTF_RE = re.compile(
    r"^histogram_fraction\s*\(\s*(-?[0-9]*\.?[0-9]+)\s*,"
    r"\s*(-?[0-9]*\.?[0-9]+)\s*,\s*(.+)\)$",
    re.DOTALL,
)
# name optional: `{__name__=~"api_.*"}` is the multi-metric selector form
_SELECTOR_RE = re.compile(
    r"^([a-zA-Z_:][a-zA-Z0-9_:]*)?\s*(?:\{([^}]*)\})?$"
)
_MATCHER_RE = re.compile(r'(\w+)\s*(=~|!=|!~|=)\s*"([^"]*)"')
_UNIT_SECONDS = {"s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0}
# topk/bottomk carry a leading k argument: topk(5, metric)
_TOPK_K_RE = re.compile(r"^\s*(\d+)\s*,\s*(.+)$", re.DOTALL)
# quantile carries a leading φ argument: quantile(0.9, metric)
_QUANTILE_RE = re.compile(r"^\s*([0-9]*\.?[0-9]+)\s*,\s*(.+)$", re.DOTALL)
# count_values carries a leading label-name argument: count_values("v", metric)
_COUNT_VALUES_RE = re.compile(r'^\s*"([^"]+)"\s*,\s*(.+)$', re.DOTALL)
# offset modifier on a selector: metric{...}[5m] offset 1h
_OFFSET_RE = re.compile(r"\s+offset\s+(\d+)([smhd])\b")
# @ modifier: pin evaluation to a fixed epoch time — `m @ 1704067200`
# (promql/parser: the timestamp is unix seconds, fractional allowed).
# `@ start()` / `@ end()` sugar resolves to the query range bounds before
# parsing (`_resolve_at_bounds`); for instant queries both bounds are the
# evaluation time (PromQL spec: start()==end()==the instant query time).
_AT_RE = re.compile(r"\s+@\s+(\d+(?:\.\d+)?)(?=\s|\)|$)")
_AT_BOUND_RE = re.compile(r"(\s+@\s+)(start|end)\(\)(?=\s|\)|$)")
# label-manipulation wrappers (Prometheus functions the reference lacks)
_LABEL_FN_RE = re.compile(r"^(label_replace|label_join)\s*\((.+)\)$", re.DOTALL)
_ABSENT_RE = re.compile(r"^absent\s*\((.+)\)$", re.DOTALL)
# absent_over_time(selector[W]): 1 per query-grid bucket with NO matching
# samples (evaluated on the tumbling bucket grid like every range shape)
_ABSENT_OT_RE = re.compile(
    r"^absent_over_time\s*\((.+)\[(\d+)([smhd])\]"
    r"(?:\s+offset\s+(\d+)([smhd]))?\s*\)$",
    re.DOTALL,
)
# value-transforming scalar wrappers over an instant vector
_SCALAR_FN_RE = re.compile(
    r"^(clamp|clamp_min|clamp_max|abs|ceil|floor|sgn|sort|sort_desc|sqrt"
    r"|timestamp|minute|hour|day_of_week|day_of_month|day_of_year"
    r"|days_in_month|month|year|round|exp|ln|log2|log10"
    r"|sin|cos|tan|asin|acos|atan|sinh|cosh|tanh|deg|rad)"
    r"\s*\((.+)\)$",
    re.DOTALL,
)
# vector-vs-scalar comparison filter: `expr > 5`, `expr <= 0.2 `— drops
# non-matching samples (PromQL filter semantics; `bool` modifier returns
# 0/1 instead)
_CMP_SCALAR_RE = re.compile(
    r"^(.+?)\s*(>=|<=|==|!=|>|<)\s*(bool\s+)?(-?[0-9]+(?:\.[0-9]+)?)$",
    re.DOTALL,
)


# binary arithmetic shared by vector-vector matching and the
# vector-scalar fold (one table: adding an operator lands in both paths)
_ARITH_OPS = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": lambda a, b: a / b,
    # % is Go math.Mod (sign of the dividend) == Java/Spark double `%`;
    # fmod is an EXACT IEEE-754 operation (no rounding), so it is safe in
    # oracle-checked paths, unlike the transcendental tier.
    "%": lambda a, b: a % b,
    # ^ (right-associative) and atan2 are libm-dependent (math.Pow /
    # math.Atan2 are not correctly rounded) — convenience tier per the
    # determinism doctrine (SCALE.md): pytest-covered, never oracle-checked.
    "^": F.pow,
    "atan2": F.atan2,
}


@dataclass
class LabelMatcher:
    label: str
    op: str  # = != =~ !~
    value: str


@dataclass
class ParsedPromQL:
    """Mirror of the reference's ParsedPromQL
    (``api/query/prometheus_api.rs:689-703``) plus ``k`` for topk/bottomk."""

    metric_name: str = ""
    label_matchers: list[LabelMatcher] = field(default_factory=list)
    aggregation: str | None = None
    group_by: list[str] = field(default_factory=list)
    group_mode: str | None = None  # "by" | "without" | None
    range_seconds: float | None = None
    function: str | None = None
    k: int | None = None
    q: float | None = None  # quantile φ
    dst_label: str | None = None  # count_values output label
    offset_seconds: float = 0.0
    at_seconds: float | None = None
    predict_ahead_s: int | None = None  # predict_linear horizon
    hw_sf: float | None = None  # holt_winters level factor
    hw_tf: float | None = None  # holt_winters trend factor
    q_str: str | None = None  # histogram_quantile φ as written (exact)
    frac_lo: int | None = None  # histogram_fraction thresholds (exact micros)
    frac_hi: int | None = None


def _in_quotes(s: str, pos: int) -> bool:
    """True iff position ``pos`` lies inside a single- or double-quoted
    span of ``s`` (simple scanner; PromQL string literals don't nest)."""
    quote: str | None = None
    for i, ch in enumerate(s):
        if i >= pos:
            break
        if quote is None:
            if ch in "\"'":
                quote = ch
        elif ch == quote:
            quote = None
    return quote is not None


def _resolve_at_bounds(
    promql: str, start_s: float | None, end_s: float | None
) -> str:
    """Resolve the `@ start()` / `@ end()` preprocessor sugar to a numeric
    `@` pin (PromQL spec: the functions evaluate to the query range bounds;
    for instant queries both bounds equal the evaluation time). With no
    bound available (instant query with no eval time = whole-history
    evaluation) the pin is dropped — `@ now` is the default anyway. Quoted
    occurrences are data and left alone. One substitution per scan so
    `_in_quotes` always sees current positions."""
    while True:
        for m in _AT_BOUND_RE.finditer(promql):
            if _in_quotes(promql, m.start()):
                continue
            v = start_s if m.group(2) == "start" else end_s
            if v is None:
                promql = (promql[: m.start()] + promql[m.end() :]).strip()
            else:
                num = str(int(v)) if float(v) == int(v) else repr(float(v))
                promql = promql[: m.start()] + m.group(1) + num + promql[m.end() :]
            break
        else:
            return promql


def parse_promql(promql: str) -> ParsedPromQL:
    promql = promql.strip()
    out = ParsedPromQL()

    # offset modifier: textually stripped first (one offset per vector
    # expression in this grammar — it attaches to the single selector).
    # Matches inside quoted label values must NOT count: the literal text
    # 'offset 5m' in a matcher value is data, not a modifier.
    for om in _OFFSET_RE.finditer(promql):
        if not _in_quotes(promql, om.start()):
            out.offset_seconds = float(om.group(1)) * _UNIT_SECONDS[om.group(2)]
            promql = (promql[: om.start()] + promql[om.end() :]).strip()
            break

    # any offset modifier the strip did NOT consume — negative duration
    # (feature-flagged in Prometheus), bad unit, missing duration — would
    # silently become part of a metric name and match nothing; fail loudly
    # instead (same doctrine as the r7 parser-edge fixes)
    for leftover in re.finditer(r"\s+offset\s+", promql):
        if not _in_quotes(promql, leftover.start()):
            raise ValueError(
                f"unsupported offset modifier in {promql!r} (negative "
                "offsets are feature-gated upstream and not supported "
                "here; durations must be <N><s|m|h|d>)"
            )

    # @ modifier: same textual-strip treatment (one eval-time pin per
    # vector expression; quoted occurrences are data)
    for am in _AT_RE.finditer(promql):
        if not _in_quotes(promql, am.start()):
            out.at_seconds = float(am.group(1))
            promql = (promql[: am.start()] + promql[am.end() :]).strip()
            break

    m = _AGG_RE.match(promql)
    if m:
        out.aggregation = m.group(1)
        if m.group(3):
            out.group_mode = m.group(2)
            out.group_by = [s.strip() for s in m.group(3).split(",")]
        inner = m.group(4)
        if out.aggregation in ("topk", "bottomk"):
            km = _TOPK_K_RE.match(inner)
            if km:
                out.k = int(km.group(1))
                inner = km.group(2)
        elif out.aggregation == "quantile":
            qm = _QUANTILE_RE.match(inner)
            if qm:
                out.q = float(qm.group(1))
                inner = qm.group(2)
        elif out.aggregation == "count_values":
            cm = _COUNT_VALUES_RE.match(inner)
            if cm:
                out.dst_label = cm.group(1)
                inner = cm.group(2)
        inner_parsed = parse_promql(inner)
        out.metric_name = inner_parsed.metric_name
        out.label_matchers = inner_parsed.label_matchers
        out.range_seconds = inner_parsed.range_seconds
        out.function = inner_parsed.function
        out.offset_seconds = out.offset_seconds or inner_parsed.offset_seconds
        if out.at_seconds is None:
            out.at_seconds = inner_parsed.at_seconds
        return out

    m = _PREDICT_RE.match(promql)
    if m:
        out.function = "predict_linear"
        out.range_seconds = float(m.group(2)) * _UNIT_SECONDS[m.group(3)]
        out.predict_ahead_s = int(m.group(4))
        inner_parsed = parse_promql(m.group(1))
        out.metric_name = inner_parsed.metric_name
        out.label_matchers = inner_parsed.label_matchers
        out.offset_seconds = out.offset_seconds or inner_parsed.offset_seconds
        if out.at_seconds is None:
            out.at_seconds = inner_parsed.at_seconds
        return out

    m = _QOT_RE.match(promql)
    if m:
        out.function = "quantile_over_time"
        out.q = float(m.group(1))
        out.range_seconds = float(m.group(3)) * _UNIT_SECONDS[m.group(4)]
        inner_parsed = parse_promql(m.group(2))
        out.metric_name = inner_parsed.metric_name
        out.label_matchers = inner_parsed.label_matchers
        out.offset_seconds = out.offset_seconds or inner_parsed.offset_seconds
        if out.at_seconds is None:
            out.at_seconds = inner_parsed.at_seconds
        return out

    m = _HW_RE.match(promql)
    if m:
        out.function = "holt_winters"
        out.range_seconds = float(m.group(2)) * _UNIT_SECONDS[m.group(3)]
        out.hw_sf = float(m.group(4))
        out.hw_tf = float(m.group(5))
        inner_parsed = parse_promql(m.group(1))
        out.metric_name = inner_parsed.metric_name
        out.label_matchers = inner_parsed.label_matchers
        out.offset_seconds = out.offset_seconds or inner_parsed.offset_seconds
        if out.at_seconds is None:
            out.at_seconds = inner_parsed.at_seconds
        return out

    m = _HISTQ_RE.match(promql)
    if m:
        out.function = "histogram_quantile"
        out.q = float(m.group(1))
        out.q_str = m.group(1)
        inner_parsed = parse_promql(m.group(2))
        out.metric_name = inner_parsed.metric_name
        out.label_matchers = inner_parsed.label_matchers
        out.offset_seconds = out.offset_seconds or inner_parsed.offset_seconds
        if out.at_seconds is None:
            out.at_seconds = inner_parsed.at_seconds
        return out

    m = _HISTF_RE.match(promql)
    if m:
        from fractions import Fraction as _Fr

        # thresholds live on the same exact-micros grid as the le bounds
        # (the engine's _le_micros conversion); spellings finer than 10⁻⁶
        # would silently land between grid points — loud-reject those
        lo_fr = _Fr(m.group(1)) * 1_000_000
        hi_fr = _Fr(m.group(2)) * 1_000_000
        if lo_fr.denominator != 1 or hi_fr.denominator != 1:
            raise ValueError(
                "histogram_fraction thresholds finer than 1e-6 are not "
                f"representable on the exact bucket grid (got "
                f"{m.group(1)}, {m.group(2)})"
            )
        if not (0 <= lo_fr < hi_fr):
            raise ValueError(
                "histogram_fraction needs 0 <= lo < hi "
                f"(got {m.group(1)}, {m.group(2)})"
            )
        out.function = "histogram_fraction"
        out.frac_lo, out.frac_hi = int(lo_fr), int(hi_fr)
        inner_parsed = parse_promql(m.group(3))
        out.metric_name = inner_parsed.metric_name
        out.label_matchers = inner_parsed.label_matchers
        out.offset_seconds = out.offset_seconds or inner_parsed.offset_seconds
        if out.at_seconds is None:
            out.at_seconds = inner_parsed.at_seconds
        return out

    m = _RANGE_FN_RE.match(promql)
    if m:
        out.function = m.group(1)
        out.range_seconds = float(m.group(3)) * _UNIT_SECONDS[m.group(4)]
        inner_parsed = parse_promql(m.group(2))
        out.metric_name = inner_parsed.metric_name
        out.label_matchers = inner_parsed.label_matchers
        out.offset_seconds = out.offset_seconds or inner_parsed.offset_seconds
        if out.at_seconds is None:
            out.at_seconds = inner_parsed.at_seconds
        return out

    m = _SELECTOR_RE.match(promql)
    if m:
        out.metric_name = m.group(1)
        if m.group(2):
            out.label_matchers = parse_label_matchers(m.group(2))
        if out.metric_name is None and m.group(2) is not None:
            # bare-brace selector: the name constraint (if any) rides as
            # a __name__ matcher (`{__name__=~"api_.*"}` — the standard
            # Prometheus multi-metric idiom); an equality __name__
            # promotes to the metric name so downstream paths (absent,
            # ns-prefilter, bucket grouping) behave as for a named form
            eq = [
                lm for lm in out.label_matchers
                if lm.label == "__name__" and lm.op == "="
            ]
            if eq:
                out.metric_name = eq[0].value
                out.label_matchers = [
                    lm for lm in out.label_matchers if lm not in eq
                ]
            elif not out.label_matchers:
                raise ValueError(
                    "empty selector {} matches everything — name a metric "
                    "or add at least one matcher"
                )
            else:
                out.metric_name = None
                return out
    if not out.metric_name:
        # reference fallback: the whole string becomes the metric name.
        # That is only sane for name-shaped residue — the reference's lax
        # model (and this engine's arbitrary name column) admits weird
        # names like dashes, so those stay queryable — but an EXPRESSION
        # that fell through every grammar branch (brackets, parens,
        # operators, whitespace, quotes) would silently filter on a
        # nonsense name and return empty; fail loudly instead (same
        # doctrine as the offset guard)
        if re.search(r"[\[\](){}\s+*/%<>=!,|@\"'^~;`\\]", promql):
            raise ValueError(
                f"unparseable PromQL expression {promql!r}: no grammar "
                "branch matched and the residue is not a metric name"
            )
        out.metric_name = promql
    return out


def parse_label_matchers(s: str) -> list[LabelMatcher]:
    return [
        LabelMatcher(label=m.group(1), op=m.group(2), value=m.group(3))
        for m in _MATCHER_RE.finditer(s)
    ]


def discover_label_columns(parsed: ParsedPromQL) -> list[str]:
    """Matcher labels + group_by labels, first-seen order (reference
    ``api/query/prometheus_api.rs:855-874``). ``__name__`` is the
    metric-name pseudo-label (already bound to ``cols.name``), never a
    label column."""
    labels: list[str] = []
    for m in parsed.label_matchers:
        if m.label != "__name__" and m.label not in labels:
            labels.append(m.label)
    for lbl in parsed.group_by:
        if lbl not in labels:
            labels.append(lbl)
    return labels


def effective_group_by(parsed: ParsedPromQL, cols: MetricsCols) -> list[str]:
    """Resolve the aggregation's grouping labels: ``by (...)`` lists them
    directly; ``without (...)`` keeps every known series label (matcher
    labels + the frame's bound label columns) EXCEPT those listed —
    Prometheus's complement semantics."""
    if parsed.group_mode == "without":
        all_labels = list(
            dict.fromkeys([*discover_label_columns(parsed), *cols.labels])
        )
        return [l for l in all_labels if l not in parsed.group_by]
    return parsed.group_by


def _selector_filter(parsed: ParsedPromQL, cols: MetricsCols) -> Column:
    # metric_name None = bare-brace multi-metric selector: the name
    # constraint (if any) rides as a __name__ matcher below
    cond = (
        F.col(cols.name) == F.lit(parsed.metric_name)
        if parsed.metric_name is not None
        else F.lit(True)
    )
    for m in parsed.label_matchers:
        # __name__ is the metric-name pseudo-label, not a column
        col = cols.name if m.label == "__name__" else m.label
        cond = cond & label_matcher(col, m.op, m.value)
    return cond


_INSTANT_AGGS = {
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "stddev": F.stddev,
    "stdvar": F.var_samp,
}


def _agg_column(agg: str, value_col: str, q: float | None = None) -> Column:
    if agg == "count":
        return F.count(F.lit(1))
    if agg == "group":
        # PromQL `group`: constant 1 per output group (membership marker)
        return F.min(F.lit(1.0))
    if agg == "quantile" and q is not None:
        # exact interpolated percentile (matches DuckDB quantile_cont /
        # ANSI percentile_cont on the same sorted values)
        return F.percentile(F.col(value_col), F.lit(q))
    fn = _INSTANT_AGGS.get(agg, F.avg)  # reference falls back to AVG
    return fn(F.col(value_col))


def _ns_prefilter(
    df: DataFrame, start_s: float | None, end_s: float | None
) -> DataFrame:
    """Scan-pushable companion to the µs-timestamp range filter.

    Frames carrying the raw ns column get an EXTRA predicate on it, and
    frames whose stored column is a native µs timestamp get one on ``ts``:
    whichever column is stored (int64 ns for TIMESTAMP(NANOS) parquet,
    timestamp for TIMESTAMP(MICROS)) pushes to row-group stats; the derived
    twin's predicate is a cheap post-scan filter. Bounds are widened by 1µs
    so the (still applied) semantic range filter stays authoritative — this
    only prunes I/O, never changes results."""
    if "ts_ns" not in df.columns:
        return df
    dtypes = dict(df.dtypes)
    has_ts = dtypes.get("ts", "").startswith("timestamp")
    if start_s is not None:
        lo_us = int(round(start_s * 1e6))
        df = df.filter(F.col("ts_ns") >= lo_us * 1000)
        if has_ts:
            df = df.filter(F.col("ts") >= F.timestamp_micros(F.lit(lo_us)))
    if end_s is not None:
        hi_us = int(round(end_s * 1e6)) + 1
        df = df.filter(F.col("ts_ns") < hi_us * 1000)
        if has_ts:
            df = df.filter(F.col("ts") < F.timestamp_micros(F.lit(hi_us)))
    return df


_SCALAR_WRAP_RE = re.compile(r"^scalar\s*\((.+)\)$", re.DOTALL)

# vector(<literal>): a one-sample vector with no labels (promql
# functions.go funcVector) — the `or vector(0)` empty-fallback idiom
_VECTOR_RE = re.compile(r"^vector\s*\(\s*(-?\d+(?:\.\d+)?)\s*\)$")

# time(): the evaluation time as a scalar (promql funcTime) — instant
# queries fold it as the eval timestamp, range queries per grid step
_TIME_RE = re.compile(r"^time\s*\(\s*\)$")


def _scalar_of(
    df: DataFrame,
    expr: str,
    time_s: float | None,
    cols: MetricsCols,
    tiebreak: list[str] | None,
) -> DataFrame:
    """Evaluate ``scalar(expr)``: a 1-row frame with column ``_sc`` holding
    the inner instant vector's single sample value, or NaN when the vector
    has != 1 samples (promql/functions.go funcScalar). The frame is tiny
    by construction — callers broadcast it into a crossJoin fold."""
    inner = promql_instant(df, expr, time_s, cols, tiebreak)
    vcol = "value" if "value" in inner.columns else cols.value
    return inner.agg(
        F.when(
            F.count(F.lit(1)) == 1, F.max(vcol).cast("double")
        )
        .otherwise(F.lit(float("nan")))
        .alias("_sc")
    )


def _scalar_per_step(
    df: DataFrame,
    inner_expr: str,
    start_s: float,
    end_s: float,
    step_s: int,
    cols: MetricsCols,
    faithful: bool,
    ts_ns_col: str,
) -> DataFrame:
    """Per-step ``scalar(v)`` on the range grid: for each time_bucket the
    inner range vector's single sample value, or NaN when that step holds
    != 1 samples — including steps where the vector is empty, which the
    full [start, end] grid materializes (promql/functions.go funcScalar,
    evaluated per step). Output: (time_bucket, _sc), one row per grid
    step — bounded by the step count, so callers broadcast it."""
    inner = promql_range(
        df, inner_expr, start_s, end_s, step_s, cols, faithful, ts_ns_col
    )
    per = inner.groupBy("time_bucket").agg(
        F.when(F.count(F.lit(1)) == 1, F.max("value").cast("double"))
        .otherwise(F.lit(float("nan")))
        .alias("_sc")
    )
    b0, b1 = int(start_s // step_s), int(end_s // step_s)
    grid = df.sparkSession.range(b0, b1 + 1).select(
        F.timestamp_seconds((F.col("id") * step_s).cast("long")).alias(
            "time_bucket"
        )
    )
    return grid.join(per, "time_bucket", "left").select(
        "time_bucket",
        F.coalesce(F.col("_sc"), F.lit(float("nan"))).alias("_sc"),
    )


def promql_instant(
    df: DataFrame,
    promql: str,
    time_s: float | None = None,
    cols: MetricsCols = MetricsCols(),
    tiebreak: list[str] | None = None,
    rollups: list[tuple[int, object, bool]] | None = None,
    ordered: bool = True,
) -> DataFrame:
    """Instant query (reference ``transpile_promql_instant``,
    ``api/query/prometheus_api.rs:877-935``).

    Aggregated form: one row per (metric, *by) with MAX(ts) as the sample
    timestamp, ordered by value desc. Selector form: latest single sample.

    ``rollups`` — optional continuous aggregates (same list as
    ``promql_range``): a moment ``*_over_time`` window whose bounds cover
    whole rollup buckets (the aligned alert-rule shape,
    ``avg_over_time(m[1d])`` evaluated on the day boundary) serves from
    the rollup, reproducing the raw path's ``timestamp_`` via the
    ``max_ts`` moment; anything else evaluates raw. Forwards through the
    recursive branches like the range door.
    """
    promql = _resolve_at_bounds(promql, time_s, time_s)
    promql = _strip_outer_parens(promql)
    setop = _split_top_level_setop(promql)
    if setop:
        left, op, on_labels, right = setop
        # operands feed the set-op join/union: their exit ordering would
        # be a WASTED range shuffle (Catalyst does not eliminate a sort
        # below a join — OPTIMIZATION r15, guide §2.4)
        lf = promql_instant(
            df, left, time_s, cols, tiebreak, rollups=rollups, ordered=False
        )
        rf = promql_instant(
            df, right, time_s, cols, tiebreak, rollups=rollups, ordered=False
        )
        if "value" not in lf.columns and cols.value in lf.columns:
            lf = lf.withColumnRenamed(cols.value, "value")
        if "value" not in rf.columns and cols.value in rf.columns:
            rf = rf.withColumnRenamed(cols.value, "value")
        return _vector_setop(lf, rf, op, on_labels, cols)
    cmpv = _split_top_level_cmp(promql)
    if cmpv:
        # comparison precedence sits between arithmetic and the set ops,
        # so splitting here makes `a / b > 5` evaluate (a/b) first — the
        # PromQL grammar — instead of the arithmetic splitter grabbing `/`
        left, op, want_bool, on_labels, right = cmpv
        if time_s is not None:
            # time() in a pinned instant expression is just the eval
            # timestamp — substitute the literal so the scalar paths fold
            if _TIME_RE.match(left):
                left = f"{float(time_s):f}"
            if _TIME_RE.match(right):
                right = f"{float(time_s):f}"
        num_l = re.fullmatch(r"-?\d+(?:\.\d+)?", left)
        num_r = re.fullmatch(r"-?\d+(?:\.\d+)?", right)
        if num_l and num_r:
            raise ValueError(
                f"scalar-scalar comparison {promql!r} is not a vector "
                "expression (wrap one side in vector())"
            )
        if num_l:
            # numeric literal on the LEFT (`5 < m`): evaluate the vector
            # side and flip the operator — previously this recursed the
            # literal into a selector parse of a metric named "5" and
            # silently returned empty (ADVICE r7 #3)
            rf = promql_instant(df, right, time_s, cols, tiebreak, rollups=rollups)
            if "value" not in rf.columns and cols.value in rf.columns:
                rf = rf.withColumnRenamed(cols.value, "value")
            return _apply_scalar_cmp(rf, _CMP_FLIP[op], float(left), want_bool)
        # num_r keeps the operand's ordering (the filter output IS the
        # result); the vector-vector case feeds _vector_cmp's join, where
        # operand ordering is wasted work
        lf = promql_instant(
            df, left, time_s, cols, tiebreak, rollups=rollups,
            ordered=bool(num_r),
        )
        if "value" not in lf.columns and cols.value in lf.columns:
            lf = lf.withColumnRenamed(cols.value, "value")
        if num_r:
            return _apply_scalar_cmp(lf, op, float(right), want_bool)
        rf = promql_instant(
            df, right, time_s, cols, tiebreak, rollups=rollups, ordered=False
        )
        if "value" not in rf.columns and cols.value in rf.columns:
            rf = rf.withColumnRenamed(cols.value, "value")
        return _vector_cmp(lf, rf, op, want_bool, on_labels, cols)
    vm = _VECTOR_RE.match(promql.strip())
    if vm:
        # vector(s): one label-free sample carrying the literal
        return df.sparkSession.range(1).select(
            F.lit(float(vm.group(1))).alias("value")
        )
    if _TIME_RE.match(promql.strip()):
        # time(): the evaluation timestamp as a scalar — meaningless
        # without one, so an unpinned instant query fails loudly instead
        # of inventing a clock (determinism doctrine: no Date.now in
        # query results)
        if time_s is None:
            raise ValueError(
                "time() needs an explicit evaluation time (pass time_s)"
            )
        return df.sparkSession.range(1).select(
            F.lit(float(time_s)).alias("value")
        )
    sw = _SCALAR_WRAP_RE.match(promql.strip())
    if sw and _balanced(sw.group(1)):
        # standalone scalar(v): one sample with no labels — the vector's
        # single value, or NaN when it has != 1 samples (promql spec)
        return _scalar_of(df, sw.group(1), time_s, cols, tiebreak).select(
            F.col("_sc").alias("value")
        )
    binop = _split_top_level_binop(promql)
    if binop:
        # instant binary ops: vector-scalar folds into the value column;
        # vector-vector joins on on(...)/shared labels with the metric
        # name dropped (PromQL binop semantics). Without this branch
        # `sum(a) / sum(b)` used to mis-parse as one garbage aggregation
        # and silently return empty.
        left, op, on_labels, group_mode, carry, right = binop
        arith = _ARITH_OPS[op]
        if time_s is not None:
            # time() folds as the (pinned) evaluation timestamp
            if _TIME_RE.match(left):
                left = f"{float(time_s):f}"
            if _TIME_RE.match(right):
                right = f"{float(time_s):f}"
        num_l = re.fullmatch(r"-?\d+(?:\.\d+)?", left)
        num_r = re.fullmatch(r"-?\d+(?:\.\d+)?", right)
        sc_l = _SCALAR_WRAP_RE.match(left)
        if sc_l and not _balanced(sc_l.group(1)):
            sc_l = None
        sc_r = _SCALAR_WRAP_RE.match(right)
        if sc_r and not _balanced(sc_r.group(1)):
            sc_r = None
        if (sc_l or sc_r) and not (num_l or num_r):
            # scalar(v) folds like a numeric literal, but the number comes
            # from a 1-row subquery: broadcast crossJoin, no key shuffle.
            # Per the spec the fold value is the vector's single sample, or
            # NaN when it has != 1 samples.
            if sc_r and not sc_l:
                vec, sc_inner, vec_first = left, sc_r.group(1), True
            elif sc_l and not sc_r:
                vec, sc_inner, vec_first = right, sc_l.group(1), False
            else:  # scalar(a) / scalar(b): fold rhs into lhs's single row
                vec, sc_inner, vec_first = left, sc_r.group(1), True
            lf = promql_instant(
                df, vec, time_s, cols, tiebreak, rollups=rollups,
                ordered=False,
            )
            if "value" not in lf.columns and cols.value in lf.columns:
                lf = lf.withColumnRenamed(cols.value, "value")
            sdf = _scalar_of(df, sc_inner, time_s, cols, tiebreak)
            a, b = (
                (F.col("value"), F.col("_sc"))
                if vec_first
                else (F.col("_sc"), F.col("value"))
            )
            return (
                lf.crossJoin(F.broadcast(sdf))
                .withColumn("value", arith(a, b))
                .drop("_sc")
            )
        if num_r and not num_l:
            lf = promql_instant(df, left, time_s, cols, tiebreak, rollups=rollups)
            return lf.withColumn(
                "value", arith(F.col("value"), F.lit(float(right)))
            )
        if num_l and not num_r:
            rf = promql_instant(df, right, time_s, cols, tiebreak, rollups=rollups)
            return rf.withColumn(
                "value", arith(F.lit(float(left)), F.col("value"))
            )
        lf = promql_instant(
            df, left, time_s, cols, tiebreak, rollups=rollups, ordered=False
        )
        rf = promql_instant(
            df, right, time_s, cols, tiebreak, rollups=rollups, ordered=False
        )
        drop = {cols.name, "value", "timestamp_", cols.ts}
        shared = sorted((set(lf.columns) & set(rf.columns)) - drop)
        keys = _match_keys(shared, on_labels)
        l = lf.select(*keys, F.col("value").alias("_lv"))
        r = rf.select(*keys, F.col("value").alias("_rv"))
        joined = l.join(r, keys) if keys else l.crossJoin(r)
        if not keys:
            return joined.select(
                arith(F.col("_lv"), F.col("_rv")).alias("value")
            )
        bout = joined.select(
            *keys, arith(F.col("_lv"), F.col("_rv")).alias("value")
        )
        return bout.orderBy(*keys) if ordered else bout

    sq = _SUBQ_RE.match(promql.strip()) or _SUBQ_FN_RE.match(promql.strip())
    if sq:
        # instant subquery: evaluate the inner expression over the closed
        # window [time_s − W, time_s] on the R grid, then collapse it to
        # one sample per series — fn_over_time aggregates the points,
        # rate/increase/delta apply the reference's MAX−MIN form
        if time_s is None:
            raise ValueError(
                "subqueries in instant queries need an explicit "
                "evaluation time (pass time_s)"
            )
        fn = sq.group(1)
        if fn in ("irate", "idelta", "deriv"):
            raise ValueError(
                f"{fn} over a subquery is not supported: the inner grid "
                "erases the raw sample spacing it needs"
            )
        window_s = int(float(sq.group(3)) * _UNIT_SECONDS[sq.group(4)])
        if not sq.group(5):
            raise ValueError(
                "instant subqueries need an explicit resolution "
                "(expr[W:R]) — there is no outer step grid to inherit"
            )
        resolution_s = int(float(sq.group(5)) * _UNIT_SECONDS[sq.group(6)])
        inner = promql_range(
            df, sq.group(2), time_s - window_s, time_s, resolution_s, cols
        )
        keys = [c for c in inner.columns if c not in ("time_bucket", "value")]
        if fn in ("rate", "increase", "delta"):
            spread = F.max("value") - F.min("value")
            agg_col = (
                spread / F.lit(float(window_s)) if fn == "rate" else spread
            )
        elif fn == "last":
            agg_col = F.expr("max_by(value, time_bucket)")
        else:
            agg_col = _agg_column(fn, "value")
        out = (
            inner.groupBy(*keys)
            .agg(agg_col.alias("value"))
            .filter(F.col("value").isNotNull())
        )
        return out.orderBy(*keys) if keys else out

    am = _ABSENT_RE.match(promql.strip())
    if am:
        # absent(selector): 1-sample vector {value: 1} iff the selector
        # matches nothing in the window, else empty (PromQL semantics;
        # the reference's transpiler has no function vocabulary at all)
        inner = promql_instant(df, am.group(1), time_s, cols, tiebreak, rollups=rollups)
        return (
            inner.agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") == 0)
            .select(F.lit(1.0).alias("value"))
        )

    sm = _SCALAR_FN_RE.match(promql.strip())
    if sm and not _RANGE_FN_RE.match(promql.strip()):
        fn = sm.group(1)
        inner_expr, args = _split_label_fn_args(sm.group(2))
        res = promql_instant(df, inner_expr, time_s, cols, tiebreak, rollups=rollups)
        if "value" not in res.columns and cols.value in res.columns:
            # selector-form inner results keep the source value column;
            # the wrappers operate on the canonical "value" name
            res = res.withColumnRenamed(cols.value, "value")
        if fn == "timestamp":
            # timestamp(v): each sample's value becomes its own sample time
            # in epoch seconds (promql/functions.go funcTimestamp). The
            # inner result keeps its time column — `timestamp_` for
            # aggregated shapes, the raw ts column for selector shapes.
            ts_col = "timestamp_" if "timestamp_" in res.columns else cols.ts
            return res.withColumn(
                "value", F.unix_micros(F.col(ts_col)) / F.lit(1_000_000.0)
            )
        return _apply_scalar_fn(res, fn, args)

    cm = _CMP_SCALAR_RE.match(promql.strip())
    if cm and _balanced(cm.group(1)):
        inner = promql_instant(df, cm.group(1), time_s, cols, tiebreak, rollups=rollups)
        return _apply_scalar_cmp(
            inner, cm.group(2), float(cm.group(4)), bool(cm.group(3))
        )

    parsed = parse_promql(promql)
    out = df.filter(_selector_filter(parsed, cols))
    if parsed.at_seconds is not None:
        time_s = parsed.at_seconds  # @ pins the evaluation time
    if time_s is not None:
        t_eval = time_s - parsed.offset_seconds
        out = out.filter(F.col(cols.ts) <= F.timestamp_seconds(F.lit(t_eval)))
        out = _ns_prefilter(out, None, t_eval)

    if parsed.function is not None and parsed.range_seconds is not None:
        # range-vector function at an instant — `rate(m[5m])` through the
        # instant API, the canonical alert query: evaluate once over the
        # closed window [T − range, T] with the reference's function
        # semantics (_range_fn_value: rate/increase → MAX−MIN family,
        # *_over_time → its aggregation). Previously this fell through to
        # the latest-sample selector branch — a silent wrong answer, the
        # r7 misparse class.
        if time_s is None:
            raise ValueError(
                f"instant {parsed.function}({parsed.metric_name}[…]) needs "
                "an evaluation time (time_s or an @ pin) to bound the window"
            )
        rng = float(parsed.range_seconds)
        if rollups:
            routed = _maybe_route_rollup_instant(
                df, rollups, parsed, t_eval, rng, cols
            )
            if routed is not None:
                return routed
        win = out.filter(
            F.col(cols.ts) >= F.timestamp_seconds(F.lit(t_eval - rng))
        )
        win = _ns_prefilter(win, t_eval - rng, None)
        if parsed.function in (
            "resets", "changes", "idelta", "deriv", "predict_linear"
        ):
            # these have no reference instant analogue (the reference's
            # instant grammar never had range functions), so there is no
            # compatibility mode to honor — the old AVG fallback was a
            # silent wrong answer (VERDICT r9 item 5); evaluate the real
            # PromQL semantics over the window instead
            return _instant_range_fn_faithful(win, parsed, cols, t_eval)
        keys = [F.col(cols.name)] + [
            F.col(c) for c in discover_label_columns(parsed)
        ]
        return (
            win.groupBy(*keys)
            .agg(
                F.max(cols.ts).alias("timestamp_"),
                _range_fn_value(parsed, cols, rng).alias("value"),
            )
            .orderBy(cols.name, *discover_label_columns(parsed))
        )

    if parsed.function == "histogram_quantile" and parsed.q_str is not None:
        # histogram_quantile(φ, m_bucket): the selector matches a cumulative
        # bucket family whose `le` label holds integer upper bounds (or
        # "+Inf"); the instant vector is the latest cumulative count per
        # (series, le), fed to the exact-integer quantile algorithm. φ is
        # turned into an exact num/den pair from its decimal spelling so the
        # rank comparison stays integral.
        # An `{base}_exp_bucket` family (the bucket-preserving exponential
        # ingest shape, scale/idx/sign labels) routes to the
        # exp_histogram_quantile operator instead (VERDICT r9 item 4 —
        # previously engine-API-only); multi-metric selectors loud-reject:
        # classic (le) and exponential (scale/idx) rows cannot share one
        # quantile computation, and a regex cannot be checked statically.
        from fractions import Fraction

        if parsed.metric_name is None:
            raise ValueError(
                "histogram_quantile needs a single named bucket family — "
                "a multi-metric selector cannot distinguish classic (le) "
                "from exponential (scale/idx) bucket rows"
            )
        if parsed.metric_name.endswith("_exp_bucket"):
            return _route_exp_histogram_quantile(
                df, parsed, float(Fraction(parsed.q_str)), cols,
                time_s=time_s,
            )
        frac = Fraction(parsed.q_str)
        series = [c for c in discover_label_columns(parsed) if c != "le"]
        latest = (
            _maybe_route_hist_latest_instant(
                df.sparkSession, rollups, parsed, time_s - parsed.offset_seconds,
                cols, series,
            )
            if rollups and time_s is not None
            else None
        )
        if latest is None:
            latest = (
                out.groupBy(cols.name, *series, "le")
                # cumulative bucket counts are integral by construction;
                # the wide table's coalesced value column arrives as
                # double (e.g. OTLP bucket ingest routes through
                # value_u64) and the exact DECIMAL(38) rank/interpolation
                # math requires an integer cum
                .agg(
                    F.expr(f"max_by({cols.value}, {cols.ts})")
                    .cast("long")
                    .alias("cum")
                )
                .withColumn("_le_n", _le_micros())
            )
        return histogram_quantile_cumulative(
            latest,
            frac.numerator,
            frac.denominator,
            [cols.name, *series],
            le_col="_le_n",
            cum_col="cum",
            le_prescale=1_000_000,
        )

    if parsed.function == "histogram_fraction" and parsed.frac_lo is not None:
        # histogram_fraction(lo, hi, m_bucket): same latest-cumulative
        # frame as the quantile path, fed to the exact-rational
        # interpolation at both thresholds. Exp-bucket families route to
        # exp_histogram_fraction; multi-metric selectors loud-reject
        # (same rules as histogram_quantile).
        if parsed.metric_name is None:
            raise ValueError(
                "histogram_fraction needs a single named bucket family — "
                "a multi-metric selector cannot distinguish classic (le) "
                "from exponential (scale/idx) bucket rows"
            )
        if parsed.metric_name.endswith("_exp_bucket"):
            return _route_exp_histogram_quantile(
                df, parsed, None, cols, time_s=time_s,
                frac=(parsed.frac_lo / 1e6, parsed.frac_hi / 1e6),
            )
        series = [c for c in discover_label_columns(parsed) if c != "le"]
        latest = (
            _maybe_route_hist_latest_instant(
                df.sparkSession, rollups, parsed, time_s - parsed.offset_seconds,
                cols, series,
            )
            if rollups and time_s is not None
            else None
        )
        if latest is None:
            latest = (
                out.groupBy(cols.name, *series, "le")
                .agg(
                    F.expr(f"max_by({cols.value}, {cols.ts})")
                    .cast("long")
                    .alias("cum")
                )
                .withColumn("_le_n", _le_micros())
            )
        return histogram_fraction_cumulative(
            latest,
            parsed.frac_lo,
            parsed.frac_hi,
            [cols.name, *series],
            le_col="_le_n",
            cum_col="cum",
        )

    if parsed.aggregation == "count_values" and parsed.dst_label is not None:
        # count_values("lbl", m): one row per distinct sample value, value =
        # how many series/samples carry it; the sampled value becomes a
        # label column. Exact (integer counts, group key is the raw value).
        return (
            out.groupBy(
                F.col(cols.name),
                F.col(cols.value).alias(parsed.dst_label),
            )
            .agg(F.count(F.lit(1)).alias("value"))
            .orderBy(cols.name, parsed.dst_label)
        )

    gby = effective_group_by(parsed, cols)

    if parsed.aggregation and rollups and time_s is not None:
        routed = _maybe_route_rollup_instant_agg(
            df.sparkSession, rollups, parsed,
            time_s - parsed.offset_seconds, cols,
        )
        if routed is not None:
            return routed

    if parsed.aggregation == "quantile" and parsed.q is not None:
        qagg = out.groupBy(cols.name, *gby).agg(
            F.max(cols.ts).alias("timestamp_"),
            _agg_column("quantile", cols.value, parsed.q).alias("value"),
        )
        if not ordered:
            return qagg
        return qagg.orderBy(F.desc("value"), cols.name, *gby)

    if parsed.aggregation in ("topk", "bottomk") and parsed.k is not None:
        agg_col = _agg_column("avg", cols.value)
        grouped = out.groupBy(cols.name, *gby).agg(
            F.max(cols.ts).alias("timestamp_"), agg_col.alias("value")
        )
        order = F.asc("value") if parsed.aggregation == "bottomk" else F.desc("value")
        return grouped.orderBy(order, cols.name, *gby).limit(parsed.k)

    if parsed.aggregation:
        agg_col = _agg_column(parsed.aggregation, cols.value)
        agg = out.groupBy(cols.name, *gby).agg(
            F.max(cols.ts).alias("timestamp_"), agg_col.alias("value")
        )
        if not ordered:
            # operand position (set/cmp/binop recursion): the consumer
            # joins/unions this frame, so an exit sort would survive as a
            # wasted range shuffle below the join
            return agg
        return agg.orderBy(F.desc("value"), cols.name, *gby)

    order = [F.desc(cols.ts)] + [F.desc(t) for t in (tiebreak or [])]
    return out.orderBy(*order).limit(1)


def _split_top_level_binop(s: str):
    """Find the rightmost top-level binary arithmetic operator (outside all
    parens/braces/quotes), honouring PromQL precedence (+- bind looser than
    * / % atan2, which bind looser than right-associative ^).
    Returns (left, op, on_labels, right) or None.

    Supports the optional one-to-one matching modifier:
    ``a / on(l1, l2) b`` — the reference implements NO binary ops at all
    (its transpiler is selector/agg/rate-shaped only,
    ``api/query/prometheus_api.rs:744-826``); this is a superset following
    SURVEY §2.3's join mapping."""
    s = s.strip()
    depth = 0
    in_str: str | None = None
    candidates: dict[str, int] = {}
    for i, ch in enumerate(s):
        if in_str:
            if ch == in_str:
                in_str = None
            continue
        if ch in "\"'":
            in_str = ch
        elif ch in "({[":
            depth += 1
        elif ch in ")}]":
            depth -= 1
        elif depth == 0 and ch == "a" and s.startswith("atan2", i):
            # keyword binop (same precedence tier as * / %): identifier
            # boundaries on BOTH sides, else it's part of a metric name
            before = s[i - 1] if i > 0 else ""
            after = s[i + 5] if i + 5 < len(s) else ""
            if (
                0 < i
                and i + 5 < len(s)
                and not (before.isalnum() or before in "_:")
                and not (after.isalnum() or after in "_:")
            ):
                candidates["atan2"] = i
        elif depth == 0 and ch in "+-*/%^" and 0 < i < len(s) - 1:
            # only '-' can legitimately appear inside a metric name
            # (weird-name); it needs whitespace context to count as an
            # operator. +, * / % ^ are always operators — requiring spaces
            # around them would silently drop the split for `a/b` and let
            # the range-fn regex swallow the whole string as a garbage
            # selector (empty result, no error).
            if ch == "-":
                # a '-' directly after a comparison operator is a SIGN
                # (`m > -5` belongs to the scalar-comparison grammar)
                prev = s[:i].rstrip()
                if prev and prev[-1] in "<>=!":
                    continue
            if ch == "^":
                # ^ is RIGHT-associative (promql spec): split at the
                # LEFTMOST top-level caret so a^b^c == a^(b^c)
                candidates.setdefault(ch, i)
            elif ch != "-" or s[i - 1].isspace() or s[i + 1].isspace():
                candidates[ch] = i
    op: str | None = None
    pos = max((candidates.get(o, -1) for o in "+-"), default=-1)
    if pos >= 0:
        op = s[pos]
    else:
        tier = [(candidates[o], o) for o in ("*", "/", "%", "atan2") if o in candidates]
        if tier:
            pos, op = max(tier)
        elif "^" in candidates:
            pos, op = candidates["^"], "^"
    if op is None:
        return None
    left, right = s[:pos].strip(), s[pos + len(op) :].strip()
    on_labels: list[str] | None = None
    group_mode: str | None = None
    carry: list[str] = []
    m = re.match(r"^(on|ignoring)\s*\(([^)]*)\)\s*(.+)$", right, re.DOTALL)
    if m:
        labels = [x.strip() for x in m.group(2).split(",") if x.strip()]
        on_labels = Ignoring(labels) if m.group(1) == "ignoring" else labels
        right = m.group(3)
        gm = re.match(
            r"^(group_left|group_right)\s*(?:\(([^)]*)\))?\s*(.+)$",
            right,
            re.DOTALL,
        )
        if gm:
            group_mode = gm.group(1)
            if gm.group(2):
                carry = [x.strip() for x in gm.group(2).split(",") if x.strip()]
            right = gm.group(3)
    return left, op, on_labels, group_mode, carry, right


class Ignoring(list):
    """Matching-modifier marker: match on all SHARED labels EXCEPT these
    (PromQL ``ignoring(l1, l2)``). Passed through the splitters in the
    ``on_labels`` slot so call signatures stay stable; the join-key
    builders special-case it."""


def _match_keys(
    shared: list[str], on_labels, extra: list[str] | None = None
) -> list[str]:
    """Resolve the vector-matching join keys from the shared label columns
    and the modifier: on(...) replaces, ignoring(...) subtracts, absence
    means all shared labels. ``extra`` (e.g. time_bucket) is prepended."""
    if on_labels is None:
        keys = list(shared)
    elif isinstance(on_labels, Ignoring):
        drop = set(on_labels)
        keys = [c for c in shared if c not in drop]
    else:
        keys = list(on_labels)
    return (extra or []) + keys


def _strip_outer_parens(s: str) -> str:
    """Remove redundant outer parentheses: ``(expr)`` → ``expr`` when the
    opening paren's match is the final character (string-aware). Without
    this, parenthesized operands — ``a and (b > 3)``, a bare ``(sum(m))``
    — fell through to a selector parse of the raw text and silently
    matched nothing (ADVICE r7 family: fail-loudly doctrine)."""
    s = s.strip()
    while s.startswith("(") and s.endswith(")"):
        depth = 0
        in_str: str | None = None
        closes_at_end = False
        for i, ch in enumerate(s):
            if in_str:
                if ch == in_str:
                    in_str = None
                continue
            if ch in "\"'":
                in_str = ch
            elif ch in "({[":
                depth += 1
            elif ch in ")}]":
                depth -= 1
                if depth == 0:
                    closes_at_end = i == len(s) - 1
                    break
        if not closes_at_end:
            break
        s = s[1:-1].strip()
    return s


def _split_top_level_cmp(s: str):
    """Find the rightmost top-level comparison operator (precedence between
    arithmetic and the set operators), outside parens/braces/quotes, with
    the optional ``bool`` modifier and on()/ignoring() matching. Returns
    (left, op, want_bool, on_labels, right) or None. Matcher-internal
    ``!=``/``=~`` live inside ``{}`` (depth > 0) and never split."""
    s = s.strip()
    depth = 0
    in_str: str | None = None
    pos, op = -1, None
    i = 0
    while i < len(s):
        ch = s[i]
        if in_str:
            if ch == in_str:
                in_str = None
        elif ch in "\"'":
            in_str = ch
        elif ch in "({[":
            depth += 1
        elif ch in ")}]":
            depth -= 1
        elif depth == 0 and ch in "><=!":
            two = s[i : i + 2]
            if two in (">=", "<=", "==", "!="):
                pos, op = i, two
                i += 2
                continue
            if ch in "><":
                pos, op = i, ch
        i += 1
    if op is None:
        return None
    left = s[:pos].strip()
    right = s[pos + len(op) :].strip()
    want_bool = False
    # `bool` ends at any non-identifier char (`> bool(n)` is valid PromQL;
    # a metric actually named `boolx` must NOT lose its prefix)
    m = re.match(r"^bool(?![A-Za-z0-9_:])\s*(.+)$", right, re.DOTALL)
    if m:
        want_bool = True
        right = m.group(1)
    on_labels: list[str] | None = None
    m = re.match(r"^(on|ignoring)\s*\(([^)]*)\)\s*(.+)$", right, re.DOTALL)
    if m:
        labels = [x.strip() for x in m.group(2).split(",") if x.strip()]
        on_labels = Ignoring(labels) if m.group(1) == "ignoring" else labels
        right = m.group(3)
    # many-to-one comparison filters: group_left keeps the (many) lhs
    # samples passing the per-group comparison — exactly _vector_cmp's
    # join shape, so just consume the modifier. The unsupported variants
    # fail loudly (previously ANY group modifier fell through to a
    # selector parse of "group_left ..." and silently returned empty).
    m = re.match(
        r"^(group_left|group_right)\s*(?:\(([^)]*)\))?\s*(.+)$",
        right,
        re.DOTALL,
    )
    if m:
        if m.group(1) == "group_right":
            raise ValueError(
                "group_right on comparison filters is not supported — "
                "swap the operands and use group_left"
            )
        if m.group(2) and m.group(2).strip():
            raise ValueError(
                "label-carry group_left(...) on comparisons is not "
                "supported (filter results keep the lhs labels unchanged)"
            )
        right = m.group(3)
    if not left or not right:
        return None
    return left, op, want_bool, on_labels, right


def _vector_cmp(
    lf: DataFrame,
    rf: DataFrame,
    op: str,
    want_bool: bool,
    on_labels: list[str] | None,
    cols: MetricsCols,
) -> DataFrame:
    """Vector-vector comparison (PromQL filter semantics): join lhs to rhs
    on the match group and keep lhs samples where ``lhs op rhs`` holds —
    labels, metric name and value stay the lhs's. With ``bool``, every
    matched pair yields 0/1 instead and the metric name drops (promql
    spec). Same superset charter as the arithmetic binops."""
    drop = {cols.name, "value", cols.value, "timestamp_", cols.ts}
    shared = sorted((set(lf.columns) & set(rf.columns)) - drop)
    keys = _match_keys(shared, on_labels)
    if "time_bucket" in lf.columns and "time_bucket" in rf.columns:
        if "time_bucket" not in keys:
            keys = ["time_bucket"] + keys
    if not keys:
        raise ValueError(f"no matching labels for vector comparison {op!r}")
    r = rf.select(*keys, F.col("value").alias("_rv"))
    joined = lf.join(r, keys)
    pred = _CMP_OPS[op](F.col("value"), F.col("_rv"))
    if want_bool:
        out_cols = [c for c in lf.columns if c not in (cols.name, "value")]
        out = joined.select(
            *out_cols,
            F.when(pred, F.lit(1.0)).otherwise(F.lit(0.0)).alias("value"),
        )
    else:
        out = joined.filter(pred).select(*lf.columns)
    order = [c for c in out.columns if c != "value"]
    return out.orderBy(*order)


def _split_top_level_setop(s: str):
    """Find the rightmost top-level PromQL SET operator (``or`` lowest
    precedence, then ``and``/``unless``), outside parens/braces/quotes,
    with an optional ``on(...)`` matching modifier on the right side.
    Returns (left, op, on_labels, right) or None. The reference implements
    no binary ops at all (``api/query/prometheus_api.rs:744-826``); this
    is the set-algebra half of SURVEY §2.3/§2.7's superset, mapping to
    left-semi / left-anti / union-anti joins."""
    s = s.strip()
    depth = 0
    in_str: str | None = None
    found: dict[str, int] = {}
    for i, ch in enumerate(s):
        if in_str:
            if ch == in_str:
                in_str = None
            continue
        if ch in "\"'":
            in_str = ch
        elif ch in "({[":
            depth += 1
        elif ch in ")}]":
            depth -= 1
        elif depth == 0 and ch == " ":
            for word in ("or", "and", "unless"):
                wl = len(word)
                nxt = s[i + 1 + wl : i + 2 + wl]
                # the keyword ends at any non-identifier char: a space,
                # an opening paren (`a or(b)` is valid PromQL — ADVICE r7
                # #4's silent misparse), or end-of-string. Only an
                # identifier continuation (`orders`, `android`) keeps it
                # a selector name.
                if s[i + 1 : i + 1 + wl] == word and not re.match(
                    r"[A-Za-z0-9_:]", nxt or "\x00"
                ):
                    found[word] = i + 1
    pos, op = -1, None
    if "or" in found:
        pos, op = found["or"], "or"
    else:
        for word in ("and", "unless"):
            if found.get(word, -1) > pos:
                pos, op = found[word], word
    if op is None:
        return None
    left = s[:pos].strip()
    right = s[pos + len(op) :].strip()
    on_labels: list[str] | None = None
    m = re.match(r"^(on|ignoring)\s*\(([^)]*)\)\s*(.+)$", right, re.DOTALL)
    if m:
        labels = [x.strip() for x in m.group(2).split(",") if x.strip()]
        on_labels = Ignoring(labels) if m.group(1) == "ignoring" else labels
        right = m.group(3)
    if not left or not right:
        return None
    return left, op, on_labels, right


def _vector_setop(
    lf: DataFrame,
    rf: DataFrame,
    op: str,
    on_labels: list[str] | None,
    cols: MetricsCols,
) -> DataFrame:
    """PromQL set algebra between instant/range vectors:

    * ``and``    — lhs samples whose match-group exists in rhs (left-semi)
    * ``unless`` — lhs samples whose match-group does NOT (left-anti)
    * ``or``     — all lhs samples plus rhs samples with no lhs match
                   (union + left-anti; missing columns null-filled)

    The match group is on(...) if given, else all shared label columns
    (plus time_bucket for range shapes) — metric name, value and sample
    timestamps excluded, per PromQL's label-set matching."""
    drop = {cols.name, "value", cols.value, "timestamp_", cols.ts}
    shared = sorted((set(lf.columns) & set(rf.columns)) - drop)
    keys = _match_keys(shared, on_labels)
    if "time_bucket" in lf.columns and "time_bucket" in rf.columns:
        if "time_bucket" not in keys:
            keys = ["time_bucket"] + keys
    if not keys:
        # No shared label columns: match on the EMPTY label set (the
        # `on()` semantics; enables the `sum(m) or vector(0)`
        # empty-fallback idiom). The existence probes are 1-row broadcast
        # aggregates — no collect, no shuffle of either operand.
        # NOTE: for a LABELED lhs against a label-free rhs, strict
        # Prometheus would never match (full-label-set matching); this
        # module matches on shared columns throughout, and keys=[] is
        # that same approximation at its limit.
        rn = F.broadcast(rf.agg(F.count(F.lit(1)).alias("_rn")))
        ln = F.broadcast(lf.agg(F.count(F.lit(1)).alias("_ln")))
        if op == "and":
            out = lf.crossJoin(rn).filter(F.col("_rn") > 0).drop("_rn")
        elif op == "unless":
            out = lf.crossJoin(rn).filter(F.col("_rn") == 0).drop("_rn")
        else:  # or: lhs, plus rhs only when lhs is empty
            extra = rf.crossJoin(ln).filter(F.col("_ln") == 0).drop("_ln")
            out = lf.unionByName(extra, allowMissingColumns=True)
        order = [c for c in out.columns if c not in ("value", cols.value)]
        return out.orderBy(*order)
    if op == "and":
        out = lf.join(rf.select(*keys).distinct(), keys, "leftsemi")
    elif op == "unless":
        out = lf.join(rf.select(*keys).distinct(), keys, "leftanti")
    else:  # or
        extra = rf.join(lf.select(*keys).distinct(), keys, "leftanti")
        out = lf.unionByName(extra, allowMissingColumns=True)
    order = [c for c in out.columns if c not in ("value", cols.value)]
    return out.orderBy(*order)


def _vector_match(
    lf: DataFrame,
    rf: DataFrame,
    op: str,
    on_labels: list[str] | None,
    cols: MetricsCols,
    group_mode: str | None = None,
    carry: list[str] | None = None,
) -> DataFrame:
    """Vector matching: inner equi-join on (time_bucket, shared labels) —
    PromQL drops unmatched samples and the metric name.

    One-to-one by default; ``group_left``/``group_right`` enable
    many-to-one: the "many" side keeps its full label set, the "one" side
    contributes its value per match group (plus any ``carry`` labels listed
    in the modifier) — e.g. per-series rate divided by a per-type total."""
    shared = sorted(
        (set(lf.columns) & set(rf.columns)) - {"time_bucket", cols.name, "value"}
    )
    keys = _match_keys(shared, on_labels, extra=["time_bucket"])
    ops = _ARITH_OPS
    if group_mode in ("group_left", "group_right"):
        many, one = (lf, rf) if group_mode == "group_left" else (rf, lf)
        onep = one.select(
            *keys, *(carry or []), F.col("value").alias("_ov")
        )
        manyp = many.withColumnRenamed("value", "_mv").drop(cols.name)
        joined = manyp.join(onep, keys)
        mv, ov = F.col("_mv"), F.col("_ov")
        value = (
            ops[op](mv, ov) if group_mode == "group_left" else ops[op](ov, mv)
        )
        out_cols = [c for c in manyp.columns if c != "_mv"] + list(carry or [])
        return joined.select(*out_cols, value.alias("value")).orderBy(*out_cols)
    l = lf.select(*keys, F.col("value").alias("_lv"))
    r = rf.select(*keys, F.col("value").alias("_rv"))
    return (
        l.join(r, keys)
        .select(*keys, ops[op](F.col("_lv"), F.col("_rv")).alias("value"))
        .orderBy(*keys)
    )


def promql_range(
    df: DataFrame,
    promql: str,
    start_s: float,
    end_s: float,
    step_s: int,
    cols: MetricsCols = MetricsCols(),
    faithful: bool = False,
    ts_ns_col: str = "ts_ns",
    rollups: list[tuple[int, object, bool]] | None = None,
) -> DataFrame:
    """Range query (reference ``transpile_promql_range``,
    ``api/query/prometheus_api.rs:938-1087``): bucket = floor(ts/step)*step;
    rate/irate → (max-min)/range_seconds, increase/delta → max-min, anything
    else (incl. no function) → avg. Output:
    ``time_bucket, <name>, <labels...>, value`` ordered by bucket.

    ``faithful=True`` upgrades rate/irate/increase/deriv to the real PromQL
    semantics through this same entry point — counter-reset-aware deltas,
    last-two-samples irate, least-squares deriv (the reference's documented
    weakness, ``api/query/prometheus_api.rs:969-1012``). The per-series key
    is the discovered matcher/group_by labels plus ``cols.labels``; an outer
    aggregation (``sum by (...) (rate(...))``) then aggregates the
    per-series values, matching PromQL's two-level evaluation. irate/deriv
    need a raw-ns column (``ts_ns_col``); if absent it is derived exactly
    from the timestamp via ``unix_micros``.

    ``rollups`` — optional ``[(resolution_s, parquet_path, subsecond)]``
    continuous aggregates (``engine.attach_rollup``): any subexpression
    reaching the generic arm as a plain selector or moment aggregation
    with aligned step/bounds serves from the rollup
    (``_maybe_route_rollup``); the list forwards through every recursive
    branch, so each side of ``sum(m1) or vector(0)`` routes
    independently.
    """
    promql = _resolve_at_bounds(promql, float(start_s), float(end_s))
    promql = _strip_outer_parens(promql)
    setop = _split_top_level_setop(promql)
    if setop:
        left, op, on_labels, right = setop
        lf = promql_range(df, left, start_s, end_s, step_s, cols, faithful, ts_ns_col, rollups=rollups)
        rf = promql_range(df, right, start_s, end_s, step_s, cols, faithful, ts_ns_col, rollups=rollups)
        return _vector_setop(lf, rf, op, on_labels, cols)
    cmpv = _split_top_level_cmp(promql)
    if cmpv:
        left, op, want_bool, on_labels, right = cmpv
        if _TIME_RE.match(left) or _TIME_RE.match(right):
            # per-step time() comparison needs the fold machinery the
            # arithmetic branch has; loud until someone needs it
            raise ValueError(
                "time() comparisons are not supported in range queries"
            )
        num_l = re.fullmatch(r"-?\d+(?:\.\d+)?", left)
        num_r = re.fullmatch(r"-?\d+(?:\.\d+)?", right)
        if num_l and num_r:
            raise ValueError(
                f"scalar-scalar comparison {promql!r} is not a vector "
                "expression (wrap one side in vector())"
            )
        if num_l:
            # numeric literal on the LEFT: flip onto the vector side
            # (same fix as the instant path — ADVICE r7 #3)
            rf = promql_range(
                df, right, start_s, end_s, step_s, cols, faithful, ts_ns_col, rollups=rollups
            )
            return _apply_scalar_cmp(rf, _CMP_FLIP[op], float(left), want_bool)
        lf = promql_range(
            df, left, start_s, end_s, step_s, cols, faithful, ts_ns_col, rollups=rollups
        )
        if num_r:
            # vector-scalar comparison on the range grid (instant grew this
            # via _CMP_SCALAR_RE; the range grid uses the same filter/bool
            # fold — no join, no shuffle)
            return _apply_scalar_cmp(lf, op, float(right), want_bool)
        rf = promql_range(
            df, right, start_s, end_s, step_s, cols, faithful, ts_ns_col, rollups=rollups
        )
        return _vector_cmp(lf, rf, op, want_bool, on_labels, cols)
    if _TIME_RE.match(promql.strip()):
        # time() on the range grid: each step's own epoch seconds
        b0, b1 = int(start_s // step_s), int(end_s // step_s)
        return df.sparkSession.range(b0, b1 + 1).select(
            F.timestamp_seconds((F.col("id") * step_s).cast("long")).alias(
                "time_bucket"
            ),
            (F.col("id") * step_s).cast("double").alias("value"),
        ).orderBy("time_bucket")
    _vm_range = _VECTOR_RE.match(promql.strip())
    if _vm_range:
        # vector(s) on the range grid: the literal at every step — so
        # `agg or vector(0)` gap-fills exactly the empty steps (the
        # time_bucket join key carries the per-step matching)
        b0, b1 = int(start_s // step_s), int(end_s // step_s)
        return df.sparkSession.range(b0, b1 + 1).select(
            F.timestamp_seconds((F.col("id") * step_s).cast("long")).alias(
                "time_bucket"
            ),
            F.lit(float(_vm_range.group(1))).alias("value"),
        ).orderBy("time_bucket")
    _sw_range = _SCALAR_WRAP_RE.match(promql.strip())
    if _sw_range and _balanced(_sw_range.group(1)):
        # standalone per-step scalar(v): one sample per grid step with no
        # labels — the step's single vector value, or NaN when that step
        # holds != 1 samples (promql spec, evaluated per step)
        return (
            _scalar_per_step(
                df, _sw_range.group(1), start_s, end_s, step_s, cols,
                faithful, ts_ns_col,
            )
            .select("time_bucket", F.col("_sc").alias("value"))
            .orderBy("time_bucket")
        )
    binop = _split_top_level_binop(promql)
    if binop:
        left, op, on_labels, group_mode, carry, right = binop
        arith = _ARITH_OPS[op]
        # vector-scalar arithmetic (`rate(m[300s]) * 60`, `1 - m`): the
        # scalar side folds into the value column — no join, no shuffle
        num_l = re.fullmatch(r"-?\d+(?:\.\d+)?", left)
        num_r = re.fullmatch(r"-?\d+(?:\.\d+)?", right)
        sc_l = _SCALAR_WRAP_RE.match(left)
        if sc_l and not _balanced(sc_l.group(1)):
            sc_l = None
        sc_r = _SCALAR_WRAP_RE.match(right)
        if sc_r and not _balanced(sc_r.group(1)):
            sc_r = None
        t_l = _TIME_RE.match(left)
        t_r = _TIME_RE.match(right)
        if (sc_l or sc_r or t_l or t_r) and not (num_l or num_r):
            # scalar(v) / time() fold per STEP on the range grid: the
            # scalar side is one row per time_bucket (scalar(): NaN where
            # != 1 samples; time(): the step's epoch), joined to the
            # vector side on time_bucket — broadcast, bounded by the step
            # count (VERDICT r6 item 3 / r7 item 5; evaluating the
            # instant scalar once and smearing it over the grid would be
            # a wrong answer for moving totals)
            if (sc_r or t_r) and not (sc_l or t_l):
                vec, vec_first = left, True
                sc_side_t, sc_inner = t_r, sc_r.group(1) if sc_r else None
            elif (sc_l or t_l) and not (sc_r or t_r):
                vec, vec_first = right, False
                sc_side_t, sc_inner = t_l, sc_l.group(1) if sc_l else None
            else:  # scalar/time on both sides: fold rhs into lhs's rows
                vec, vec_first = left, True
                sc_side_t, sc_inner = t_r, sc_r.group(1) if sc_r else None
            lf = promql_range(
                df, vec, start_s, end_s, step_s, cols, faithful, ts_ns_col, rollups=rollups
            )
            if sc_side_t:
                # time(): the per-step frame is just the grid's own epochs
                b0, b1 = int(start_s // step_s), int(end_s // step_s)
                sdf = df.sparkSession.range(b0, b1 + 1).select(
                    F.timestamp_seconds(
                        (F.col("id") * step_s).cast("long")
                    ).alias("time_bucket"),
                    (F.col("id") * step_s).cast("double").alias("_sc"),
                )
            else:
                sdf = _scalar_per_step(
                    df, sc_inner, start_s, end_s, step_s, cols, faithful,
                    ts_ns_col,
                )
            a, b = (
                (F.col("value"), F.col("_sc"))
                if vec_first
                else (F.col("_sc"), F.col("value"))
            )
            out = (
                lf.join(F.broadcast(sdf), "time_bucket")
                .withColumn("value", arith(a, b))
                .drop("_sc")
            )
            return out.orderBy(*[c for c in out.columns if c != "value"])
        if num_r and not num_l:
            lf = promql_range(
                df, left, start_s, end_s, step_s, cols, faithful, ts_ns_col, rollups=rollups
            )
            return lf.withColumn(
                "value", arith(F.col("value"), F.lit(float(right)))
            )
        if num_l and not num_r:
            rf = promql_range(
                df, right, start_s, end_s, step_s, cols, faithful, ts_ns_col, rollups=rollups
            )
            return rf.withColumn(
                "value", arith(F.lit(float(left)), F.col("value"))
            )
        lf = promql_range(df, left, start_s, end_s, step_s, cols, faithful, ts_ns_col, rollups=rollups)
        rf = promql_range(df, right, start_s, end_s, step_s, cols, faithful, ts_ns_col, rollups=rollups)
        return _vector_match(lf, rf, op, on_labels, cols, group_mode, carry)

    lm = _LABEL_FN_RE.match(promql.strip())
    if lm:
        inner, args = _split_label_fn_args(lm.group(2))
        res = promql_range(df, inner, start_s, end_s, step_s, cols, faithful, ts_ns_col, rollups=rollups)
        return _apply_label_fn(res, lm.group(1), args)

    sm = _SCALAR_FN_RE.match(promql.strip())
    if sm and not _RANGE_FN_RE.match(promql.strip()):
        fn = sm.group(1)
        inner_expr, args = _split_label_fn_args(sm.group(2))
        if fn == "timestamp":
            # timestamp(selector) on the range grid: per bucket the instant
            # vector's sample is the latest point, so the value is that
            # sample's time in epoch seconds — one groupBy, no window.
            # An offset modifier shifts the evaluation window and the
            # bucket alignment (the plain-selector convention below); the
            # VALUE stays the sample's own, unshifted timestamp
            # (promql/functions.go funcTimestamp).
            parsed = parse_promql(inner_expr)
            if parsed.at_seconds is not None:
                raise ValueError(
                    "@ modifier is only supported in instant queries"
                )
            off = parsed.offset_seconds
            out = df.filter(_selector_filter(parsed, cols)).filter(
                (F.col(cols.ts) >= F.timestamp_seconds(F.lit(start_s - off)))
                & (F.col(cols.ts) <= F.timestamp_seconds(F.lit(end_s - off)))
            )
            out = _ns_prefilter(out, start_s - off, end_s - off)
            grid_ts = F.timestamp_micros(
                F.unix_micros(F.col(cols.ts)) + F.lit(int(round(off * 1e6)))
            )
            keys = [
                time_bucket(grid_ts, step_s).alias("time_bucket"),
                F.col(cols.name),
            ] + [F.col(c) for c in discover_label_columns(parsed)]
            value = F.unix_micros(F.max(cols.ts)) / F.lit(1_000_000.0)
            return df_group_sorted(out, keys, value.alias("value"))
        res = promql_range(
            df, inner_expr, start_s, end_s, step_s, cols, faithful, ts_ns_col, rollups=rollups
        )
        return _apply_scalar_fn(res, fn, args)

    ao = _ABSENT_OT_RE.match(promql.strip())
    if ao:
        parsed = parse_promql(ao.group(1))
        if parsed.at_seconds is not None:
            raise ValueError("@ modifier is only supported in instant queries")
        # trailing `offset` inside the parens (the selector form strips it
        # via parse_promql; here it sits after the range bracket, so the
        # regex captures it): shift the sample window back and re-align
        # presence onto the query grid — absent-with-offset otherwise
        # falls through to the selector fallback and reports "never absent"
        ao_off = (
            int(ao.group(4)) * _UNIT_SECONDS[ao.group(5)] if ao.group(4) else 0
        )
        # presence recomposes from rollup bucket-row EXISTENCE (downsample
        # only emits non-empty groups), so an aligned absent_over_time
        # reads rollup-sized rows — same covers/offset rules as the
        # moment routes
        samples, ts_src = None, F.col(cols.ts)
        if rollups:
            from cardinalsin_spark.sources.snapshots import read_table_auto

            best = _best_covering(rollups, start_s, end_s, step_s, ao_off)
            if best is not None:
                ro = (
                    read_table_auto(df.sparkSession, best[1])
                    if isinstance(best[1], str)
                    else best[1]
                )
                need = {cols.name, "bucket"} | {
                    m.label
                    for m in parsed.label_matchers
                    if m.label != "__name__"
                }
                if need.issubset(set(ro.columns)):
                    b = F.col("bucket")
                    samples = ro.filter(_selector_filter(parsed, cols)).filter(
                        (
                            b
                            >= F.timestamp_micros(
                                F.lit(int(round((start_s - ao_off) * 1e6)))
                            )
                        )
                        & (
                            b
                            <= F.timestamp_micros(
                                F.lit(int(round((end_s - ao_off) * 1e6)))
                            )
                        )
                    )
                    ts_src = b
        if samples is None:
            samples = df.filter(_selector_filter(parsed, cols)).filter(
                (F.col(cols.ts) >= F.timestamp_seconds(F.lit(start_s - ao_off)))
                & (F.col(cols.ts) <= F.timestamp_seconds(F.lit(end_s - ao_off)))
            )
        grid_aligned = F.timestamp_micros(
            F.unix_micros(ts_src) + F.lit(int(ao_off * 1_000_000))
        )
        present = samples.select(
            time_bucket(grid_aligned, step_s).alias("time_bucket")
        ).distinct()
        b0, b1 = int(start_s // step_s), int(end_s // step_s)
        grid = df.sparkSession.range(b0, b1 + 1).select(
            F.timestamp_seconds((F.col("id") * step_s).cast("long")).alias(
                "time_bucket"
            )
        )
        return (
            grid.join(present, "time_bucket", "left_anti")
            .select("time_bucket", F.lit(1.0).alias("value"))
            .orderBy("time_bucket")
        )

    sq = _SUBQ_RE.match(promql.strip())
    if sq:
        outer_agg = sq.group(1)
        window_s = int(float(sq.group(3)) * _UNIT_SECONDS[sq.group(4)])
        # `[W:]` — resolution omitted: Prometheus falls back to the global
        # evaluation interval; the transpiler's analogue is the range
        # query's own step (the grid the caller is already evaluating on)
        resolution_s = (
            int(float(sq.group(5)) * _UNIT_SECONDS[sq.group(6)])
            if sq.group(5)
            else int(step_s)
        )
        inner = promql_range(
            df, sq.group(2), start_s, end_s, resolution_s, cols, faithful,
            ts_ns_col, rollups=rollups,
        )
        keys = [c for c in inner.columns if c not in ("time_bucket", "value")]
        outer_bucket = F.timestamp_seconds(
            (F.unix_seconds(F.col("time_bucket")) / window_s).cast("long")
            * F.lit(window_s)
        )
        if outer_agg == "last":
            agg_col = F.expr("max_by(value, time_bucket)")
        else:
            agg_col = _agg_column(outer_agg, "value")
        return (
            inner.groupBy(outer_bucket.alias("time_bucket"), *keys)
            .agg(agg_col.alias("value"))
            .orderBy("time_bucket", *keys)
        )

    sqf = _SUBQ_FN_RE.match(promql.strip())
    if sqf:
        fn = sqf.group(1)
        if fn not in ("rate", "increase", "delta"):
            raise ValueError(
                f"{fn} over a subquery is not supported: the inner grid "
                "erases the raw sample spacing the last-two-samples/"
                "least-squares family needs (rate/increase/delta use the "
                "reference's MAX−MIN form and are supported)"
            )
        if faithful:
            raise ValueError(
                f"faithful {fn} over a subquery is not supported — the "
                "counter-reset machinery needs raw samples, not the inner "
                "grid; use faithful=False"
            )
        window_s = int(float(sqf.group(3)) * _UNIT_SECONDS[sqf.group(4)])
        resolution_s = (
            int(float(sqf.group(5)) * _UNIT_SECONDS[sqf.group(6)])
            if sqf.group(5)
            else int(step_s)
        )
        inner = promql_range(
            df, sqf.group(2), start_s, end_s, resolution_s, cols, faithful,
            ts_ns_col, rollups=rollups,
        )
        keys = [c for c in inner.columns if c not in ("time_bucket", "value")]
        outer_bucket = F.timestamp_seconds(
            (F.unix_seconds(F.col("time_bucket")) / window_s).cast("long")
            * F.lit(window_s)
        )
        spread = F.max("value") - F.min("value")
        value = spread / F.lit(float(window_s)) if fn == "rate" else spread
        return (
            inner.groupBy(outer_bucket.alias("time_bucket"), *keys)
            .agg(value.alias("value"))
            .orderBy("time_bucket", *keys)
        )

    parsed = parse_promql(promql)
    if parsed.at_seconds is not None:
        if parsed.function is not None:
            # rate(m[5m] @ t): the range vector is pinned, so the function
            # evaluates ONCE over the window [pin − range, pin] (closed
            # bounds — the same convention as the bucket grid's filters)
            # and the resulting instant vector replicates across the grid,
            # exactly like a pinned selector. The faithful family would
            # need the counter-reset machinery re-run at the pin — loud
            # reject rather than a silently-different answer.
            if faithful:
                raise ValueError(
                    "@ on range functions is not supported with "
                    "faithful=True; use faithful=False or an unpinned query"
                )
            rng = parsed.range_seconds
            if rng is None:
                raise ValueError(
                    f"@-pinned function {parsed.function!r} needs a [range]"
                )
            pin = parsed.at_seconds
            win = df.filter(_selector_filter(parsed, cols)).filter(
                (F.col(cols.ts) >= F.timestamp_seconds(F.lit(pin - rng)))
                & (F.col(cols.ts) <= F.timestamp_seconds(F.lit(pin)))
            )
            win = _ns_prefilter(win, pin - rng, pin)
            if parsed.function in (
                "resets", "changes", "idelta", "deriv", "predict_linear"
            ):
                # same rule as the instant path: no reference analogue
                # exists, so the AVG degradation would be a silent wrong
                # answer — evaluate faithfully at the pin, then replicate
                inst = _instant_range_fn_faithful(win, parsed, cols, pin).drop(
                    "timestamp_"
                )
                return _replicate_over_grid(
                    inst, df.sparkSession, start_s, end_s, step_s
                )
            keys = [F.col(cols.name)] + [
                F.col(c) for c in discover_label_columns(parsed)
            ]
            inst = win.groupBy(*keys).agg(
                _range_fn_value(parsed, cols, float(rng)).alias("value")
            )
            return _replicate_over_grid(
                inst, df.sparkSession, start_s, end_s, step_s
            )
        # @ pins evaluation: Prometheus evaluates every grid step at the
        # fixed timestamp, so the result is the instant vector at the pin
        # replicated across the [start, end] bucket grid.
        inst = promql_instant(df, promql, None, cols)
        if "value" not in inst.columns and cols.value in inst.columns:
            # selector-form instant results keep the source value column
            inst = inst.withColumnRenamed(cols.value, "value")
        inst = inst.drop(
            *[c for c in ("timestamp_", cols.ts, ts_ns_col) if c in inst.columns]
        )
        return _replicate_over_grid(
            inst, df.sparkSession, start_s, end_s, step_s
        )
    off = parsed.offset_seconds
    out = df.filter(_selector_filter(parsed, cols)).filter(
        (F.col(cols.ts) >= F.timestamp_seconds(F.lit(start_s - off)))
        & (F.col(cols.ts) <= F.timestamp_seconds(F.lit(end_s - off)))
    )
    out = _ns_prefilter(out, start_s - off, end_s - off)
    if off:
        # offset re-aligns the shifted samples onto the query's bucket
        # grid: ts + offset (exact integer µs shift) so output timestamps
        # stay in [start, end] like Prometheus's `... offset 5m` evaluation
        out = out.withColumn(
            cols.ts,
            F.timestamp_micros(
                F.unix_micros(F.col(cols.ts)) + F.lit(int(round(off * 1e6)))
            ),
        )
        if ts_ns_col in out.columns:
            # the raw-ns column no longer agrees with the shifted timestamp;
            # drop it so downstream (faithful irate/deriv) re-derives it
            out = out.drop(ts_ns_col)
    label_cols = discover_label_columns(parsed)

    if parsed.function == "histogram_quantile" and parsed.q_str is not None:
        # histogram_quantile(φ, m_bucket) on the range grid: per step the
        # bucket family's state is the LATEST cumulative count per
        # (series, le) in the bucket (counters only move forward inside a
        # step), then the same exact-integer quantile algorithm as the
        # instant path runs per (step, series). Without this branch the
        # default AVG arm would average cumulative counts ACROSS le
        # buckets — the reference's silent degradation
        # (api/query/prometheus_api.rs:998-1012), a wrong answer here.
        # Exp-bucket families route to exp_histogram_quantile per step;
        # multi-metric selectors loud-reject (same rule as the instant
        # path).
        from fractions import Fraction

        if parsed.metric_name is None:
            raise ValueError(
                "histogram_quantile needs a single named bucket family — "
                "a multi-metric selector cannot distinguish classic (le) "
                "from exponential (scale/idx) bucket rows"
            )
        if parsed.metric_name.endswith("_exp_bucket"):
            return _route_exp_histogram_quantile(
                df, parsed, float(Fraction(parsed.q_str)), cols,
                start_s=start_s, end_s=end_s, step_s=step_s,
            )
        frac = Fraction(parsed.q_str)
        series = [c for c in label_cols if c != "le"]
        latest = (
            _maybe_route_hist_latest(
                df.sparkSession, rollups, parsed, start_s, end_s, step_s,
                cols, series,
            )
            if rollups
            else None
        )
        if latest is None:
            latest = (
                out.groupBy(
                    time_bucket(cols.ts, step_s).alias("time_bucket"),
                    F.col(cols.name),
                    *series,
                    "le",
                )
                .agg(
                    F.expr(f"max_by({cols.value}, {cols.ts})")
                    .cast("long")
                    .alias("cum")
                )
                .withColumn("_le_n", _le_micros())
            )
        return histogram_quantile_cumulative(
            latest,
            frac.numerator,
            frac.denominator,
            ["time_bucket", cols.name, *series],
            le_col="_le_n",
            cum_col="cum",
            le_prescale=1_000_000,
        )

    if parsed.function == "histogram_fraction" and parsed.frac_lo is not None:
        # histogram_fraction on the range grid: per step, same
        # latest-cumulative state as the quantile branch above.
        # Exp-bucket families route per step; multi-metric selectors
        # loud-reject (same rules as histogram_quantile).
        if parsed.metric_name is None:
            raise ValueError(
                "histogram_fraction needs a single named bucket family — "
                "a multi-metric selector cannot distinguish classic (le) "
                "from exponential (scale/idx) bucket rows"
            )
        if parsed.metric_name.endswith("_exp_bucket"):
            return _route_exp_histogram_quantile(
                df, parsed, None, cols,
                start_s=start_s, end_s=end_s, step_s=step_s,
                frac=(parsed.frac_lo / 1e6, parsed.frac_hi / 1e6),
            )
        series = [c for c in label_cols if c != "le"]
        latest = (
            _maybe_route_hist_latest(
                df.sparkSession, rollups, parsed, start_s, end_s, step_s,
                cols, series,
            )
            if rollups
            else None
        )
        if latest is None:
            latest = (
                out.groupBy(
                    time_bucket(cols.ts, step_s).alias("time_bucket"),
                    F.col(cols.name),
                    *series,
                    "le",
                )
                .agg(
                    F.expr(f"max_by({cols.value}, {cols.ts})")
                    .cast("long")
                    .alias("cum")
                )
                .withColumn("_le_n", _le_micros())
            )
        return histogram_fraction_cumulative(
            latest,
            parsed.frac_lo,
            parsed.frac_hi,
            ["time_bucket", cols.name, *series],
            le_col="_le_n",
            cum_col="cum",
        )

    if faithful and parsed.function in (
        "rate", "irate", "increase", "deriv", "idelta", "delta",
        "resets", "changes", "predict_linear", "holt_winters",
    ):
        if rollups and faithful is True:
            routed = _maybe_route_rollup_counter(
                df, rollups, parsed, start_s, end_s, step_s, cols
            )
            if routed is not None:
                return routed
        return _promql_range_faithful(
            out, parsed, step_s, cols, label_cols, ts_ns_col, faithful
        )

    if rollups:
        routed = _maybe_route_rollup(
            df, rollups, parsed, start_s, end_s, step_s, cols
        )
        if routed is not None:
            return routed

    # NOTE (reference fidelity): when BOTH an aggregation and a range
    # function parse (`sum(rate(m[300s]))`), the function branch wins and
    # output stays per-(bucket, discovered labels) — exactly the
    # reference's precedence (api/query/prometheus_api.rs:969-1012 runs
    # before the aggregation arm). The real two-level PromQL evaluation
    # (aggregate ACROSS series after the per-series rate) is the
    # faithful=True path (_promql_range_faithful).
    keys = [time_bucket(cols.ts, step_s).alias("time_bucket"), F.col(cols.name)] + [
        F.col(c) for c in label_cols
    ]

    if parsed.function is not None:
        over = (
            parsed.function[: -len("_over_time")]
            if parsed.function.endswith("_over_time")
            else None
        )
        rng = parsed.range_seconds
        if (
            over in ("avg", "min", "max", "sum", "count")
            and parsed.q is None
            and rng is not None
            and rng > step_s
            and rng % step_s == 0
        ):
            # sliding *_over_time (the Grafana smoothing default: window
            # > step): the window for the step ending at (j+1)·step is
            # the last m = rng/step whole steps — the natural sliding
            # extension of this arm's window==bucket convention (m == 1
            # degenerates to it). Ranges that aren't a whole multiple of
            # the step keep the historical per-bucket behaviour below.
            return _range_sliding_moment(
                out, over, rng // step_s, start_s, end_s, step_s, cols,
                label_cols,
            )
        value = _range_fn_value(
            parsed, cols, parsed.range_seconds or float(step_s)
        )
    elif (
        parsed.aggregation in ("topk", "bottomk") and parsed.k is not None
    ):
        # real per-step top-k (the instant path's semantics on the range
        # grid): per-series step value (AVG per bucket, the established
        # selector convention), ranked within each step — the generic
        # aggregation arm would AVG across ALL series instead. The
        # rank<=k window compiles to WindowGroupLimit (map-side partial
        # top-k below the exchange, same shape pinned for KMV).
        gby = effective_group_by(parsed, cols)
        grouped = out.groupBy(
            time_bucket(cols.ts, step_s).alias("time_bucket"),
            F.col(cols.name),
            *[F.col(c) for c in gby],
        ).agg(F.avg(cols.value).alias("value"))
        order = (
            F.asc("value")
            if parsed.aggregation == "bottomk"
            else F.desc("value")
        )
        w = Window.partitionBy("time_bucket", cols.name).orderBy(
            order, *[F.asc(c) for c in gby]
        )
        return (
            grouped.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= parsed.k)
            .drop("_rk")
            .orderBy("time_bucket", order, cols.name, *gby)
        )
    elif (
        parsed.aggregation == "count_values" and parsed.dst_label is not None
    ):
        # real per-step count_values: one row per (step, distinct sampled
        # value), the value becoming a label column — exact integer
        # counts, like the instant path
        return (
            out.groupBy(
                time_bucket(cols.ts, step_s).alias("time_bucket"),
                F.col(cols.name),
                F.col(cols.value).alias(parsed.dst_label),
            )
            .agg(F.count(F.lit(1)).alias("value"))
            .orderBy("time_bucket", cols.name, parsed.dst_label)
        )
    elif parsed.aggregation:
        # range aggregation groups by time_bucket + metric + group_by only
        keys = [
            time_bucket(cols.ts, step_s).alias("time_bucket"),
            F.col(cols.name),
        ] + [F.col(c) for c in effective_group_by(parsed, cols)]
        value = _agg_column(parsed.aggregation, cols.value, parsed.q)
    else:
        value = F.avg(cols.value)

    return (
        df_group_sorted(out, keys, value.alias("value"))
    )


# moment columns each routed shape aggregates — gated in every door's
# `need` check so a column-poor attached rollup (attach_rollup accepts
# any parquet with an explicit resolution) falls back to raw instead of
# raising AnalysisException mid-plan. "count" needs the row_count
# moment: the PromQL count semantics count ALL rows (F.count(lit(1)))
# while count_value counts non-NULL values (the avg divisor / SQL
# count(value)) — pre-row_count rollups simply never route counts.
_MOMENT_NEED: dict[str, frozenset[str]] = {
    "avg": frozenset({"sum_value", "count_value"}),
    "sum": frozenset({"sum_value"}),
    "min": frozenset({"min_value"}),
    "max": frozenset({"max_value"}),
    "count": frozenset({"row_count"}),
    "present": frozenset(),
    "last": frozenset({"last_value", "max_ts"}),
    "topk": frozenset({"sum_value", "count_value"}),
    "bottomk": frozenset({"sum_value", "count_value"}),
}
_COUNTER_NEED = frozenset({"max_value", "min_value"})


def _best_covering(
    rollups: list[tuple[int, object, bool]],
    start_s: float,
    end_s: float,
    step_s: int,
    off: float = 0.0,
    paths_only: bool = False,
) -> tuple[int, object] | None:
    """Pick the coarsest attached rollup whose buckets tile the (offset-
    shifted) closed bounds at this step and whose resolution divides the
    offset — the candidate loop shared by every range-door route."""
    from cardinalsin_spark.operators.rollup import rollup_covers

    off_us = int(round(off * 1e6))
    best: tuple[int, object] | None = None
    for r, target, sub in rollups:
        if paths_only and not isinstance(target, str):
            continue
        if off_us % (r * 1_000_000):
            continue  # shifted buckets would straddle output steps
        if rollup_covers(r, start_s - off, end_s - off, step_s, sub):
            if best is None or r > best[0]:
                best = (r, target)
    return best


def _maybe_route_hist_latest(
    spark: SparkSession,
    rollups: list[tuple[int, object, bool]],
    parsed: ParsedPromQL,
    start_s: float,
    end_s: float,
    step_s: int,
    cols: MetricsCols,
    series: list[str],
) -> DataFrame | None:
    """Latest-cumulative bucket state per (step, series, le) served from
    a rollup's ``(last_value, max_ts)`` moments — the histogram tier's
    continuous-aggregate path (a `le`-keyed rollup is the natural
    downsample of a classic bucket family; the reference's histogram
    queries re-scan raw, ``api/query/prometheus_api.rs:998-1012``).

    Exact under ANY segmentation: ``max_by(last_value, max_ts)`` over
    rollup rows is the globally latest raw sample of the (step, series,
    le) group, whatever finer grouping or ``fresh='union'`` segment
    split the rows carry — argmax composes, unlike ordered folds.
    Same covers/column guards as the moment routes; rollups without the
    counter moments simply never route."""
    from cardinalsin_spark.sources.snapshots import read_table_auto

    if parsed.at_seconds is not None:
        return None
    # offsets on the rollup grid route like the generic door: read the
    # shifted window, re-align buckets by +offset (argmax of
    # (last_value, max_ts) is shift-invariant — max_ts stays raw)
    off = parsed.offset_seconds or 0.0
    off_us = int(round(off * 1e6))
    best = _best_covering(rollups, start_s, end_s, step_s, off)
    if best is None:
        return None
    ro = (
        read_table_auto(spark, best[1])
        if isinstance(best[1], str)
        else best[1]
    )
    need = {cols.name, "bucket", "le", "last_value", "max_ts", *series} | {
        m.label for m in parsed.label_matchers if m.label != "__name__"
    }
    if not need.issubset(set(ro.columns)):
        return None
    b = F.col("bucket")
    ro = ro.filter(_selector_filter(parsed, cols)).filter(
        (b >= F.timestamp_micros(F.lit(int(round(start_s * 1e6)) - off_us)))
        & (b <= F.timestamp_micros(F.lit(int(round(end_s * 1e6)) - off_us)))
    )
    if off_us:
        ro = ro.withColumn(
            "bucket",
            F.timestamp_micros(F.unix_micros(b) + F.lit(off_us)),
        )
    return (
        ro.groupBy(
            time_bucket(b, step_s).alias("time_bucket"),
            F.col(cols.name),
            *series,
            "le",
        )
        .agg(
            F.expr("max_by(last_value, max_ts)").cast("long").alias("cum")
        )
        .withColumn("_le_n", _le_micros())
    )


def _maybe_route_hist_latest_instant(
    spark: SparkSession,
    rollups: list[tuple[int, object, bool]],
    parsed: ParsedPromQL,
    t_eval: float,
    cols: MetricsCols,
    series: list[str],
) -> DataFrame | None:
    """Instant-door twin of ``_maybe_route_hist_latest`` — the alert
    shape ``histogram_quantile(φ, m_bucket)`` at time T.  The instant
    state is the latest cumulative count per (series, le) at-or-before
    T with no lower bound, so the only geometry requirement is that T
    sits at a bucket END (``(T+1) % r == 0``, micros-exact for
    sub-second data): then every rollup bucket starting ≤ T holds only
    samples ≤ T, and ``max_by(last_value, max_ts)`` over them is the
    global latest sample — exact under any segmentation."""
    from cardinalsin_spark.operators.rollup import bucket_end_aligned

    best: tuple[int, object] | None = None
    for r, path, subsecond in rollups:
        if not bucket_end_aligned(t_eval, r, subsecond):
            continue
        if best is None or r > best[0]:
            best = (r, path)
    if best is None:
        return None
    from cardinalsin_spark.sources.snapshots import read_table_auto

    ro = (
        read_table_auto(spark, best[1])
        if isinstance(best[1], str)
        else best[1]
    )
    need = {cols.name, "bucket", "le", "last_value", "max_ts", *series} | {
        m.label for m in parsed.label_matchers if m.label != "__name__"
    }
    if not need.issubset(set(ro.columns)):
        return None
    ro = ro.filter(_selector_filter(parsed, cols)).filter(
        F.col("bucket")
        <= F.timestamp_micros(F.lit(int(round(t_eval * 1e6))))
    )
    return (
        ro.groupBy(F.col(cols.name), *series, "le")
        .agg(
            F.expr("max_by(last_value, max_ts)").cast("long").alias("cum")
        )
        .withColumn("_le_n", _le_micros())
    )


def _maybe_route_rollup_instant_agg(
    spark: SparkSession,
    rollups: list[tuple[int, object, bool]],
    parsed: ParsedPromQL,
    t_eval: float,
    cols: MetricsCols,
) -> DataFrame | None:
    """Instant-door AGGREGATION serving — ``sum/avg/min/max/count(m)``
    and ``topk/bottomk(k, m)`` at time T.  This engine's instant
    aggregation (reference-shaped) runs over ALL samples at-or-before T
    (no lower bound), so the moments recompose it whenever T sits at a
    bucket END (``(T+1) % r == 0``, micros-exact for sub-second data —
    the same geometry as the instant histogram door): every rollup
    bucket starting ≤ T then holds only samples ≤ T.  ``timestamp_``
    reproduces exactly from the ``max_ts`` moment.  ``quantile`` and
    ``count_values`` need the raw sample distribution and never route;
    offset/@ need no special casing (both only move ``t_eval``)."""
    agg = parsed.aggregation
    if agg not in ("sum", "avg", "min", "max", "count", "topk", "bottomk"):
        return None
    if agg in ("topk", "bottomk") and parsed.k is None:
        return None
    if (
        parsed.function is not None
        or parsed.q is not None
        or parsed.dst_label is not None
    ):
        return None
    from cardinalsin_spark.operators.rollup import (
        bucket_end_aligned,
        rollup_moment,
    )

    best: tuple[int, object] | None = None
    for r, path, subsecond in rollups:
        if not bucket_end_aligned(t_eval, r, subsecond):
            continue
        if best is None or r > best[0]:
            best = (r, path)
    if best is None:
        return None
    from cardinalsin_spark.sources.snapshots import read_table_auto

    ro = (
        read_table_auto(spark, best[1])
        if isinstance(best[1], str)
        else best[1]
    )
    gby = effective_group_by(parsed, cols)
    need = (
        {cols.name, "bucket", "max_ts", *gby}
        | {m.label for m in parsed.label_matchers if m.label != "__name__"}
        | _MOMENT_NEED[agg]
    )
    if not need.issubset(set(ro.columns)):
        return None
    ro = ro.filter(_selector_filter(parsed, cols)).filter(
        F.col("bucket")
        <= F.timestamp_micros(F.lit(int(round(t_eval * 1e6))))
    )
    moment = (
        F.sum("row_count")  # PromQL count = ALL rows, not count(value)
        if agg == "count"
        else rollup_moment("avg" if agg in ("topk", "bottomk") else agg)
    )
    grouped = ro.groupBy(F.col(cols.name), *[F.col(c) for c in gby]).agg(
        F.max("max_ts").alias("timestamp_"), moment.alias("value")
    )
    if agg in ("topk", "bottomk"):
        # mirror the raw arm: GLOBAL top-k across the grouped rows
        order = F.asc("value") if agg == "bottomk" else F.desc("value")
        return grouped.orderBy(order, cols.name, *gby).limit(parsed.k)
    return grouped.orderBy(F.desc("value"), cols.name, *gby)


def _maybe_route_rollup_instant(
    df: DataFrame,
    rollups: list[tuple[int, object, bool]],
    parsed: ParsedPromQL,
    t_eval: float,
    rng: float,
    cols: MetricsCols,
) -> DataFrame | None:
    """Instant-door continuous-aggregate serving: a moment
    ``*_over_time`` window ``[T − range, T]`` exactly tiled by rollup
    buckets (``rollup_window_covers`` — closed bounds, so an N-bucket
    window is ``[k·r, k·r + N·r − 1]``) recomposes from the downsample
    moments — the aligned alert-rule shape.  The raw
    path's ``timestamp_`` (MAX raw sample time in the window) reproduces
    exactly from the rollup's ``max_ts`` moment; rollups written before
    that moment existed lack the column and simply never route.  Offset
    and ``@`` need no special casing: both only move ``t_eval``.

    Counter functions route too (VERDICT r11 item 1 at the instant
    door — ``rate(m[5m])`` through the instant API IS the canonical
    alert query): the instant door evaluates the reference's MAX−MIN
    semantics (``_range_fn_value``), which recomposes exactly from the
    max/min moments for any tiling."""
    fn = parsed.function or ""
    agg = None
    if fn.endswith("_over_time"):
        agg = fn[: -len("_over_time")]
        if agg not in ("avg", "min", "max", "sum", "count", "last",
                       "present"):
            return None
    elif fn not in ("rate", "irate", "increase", "delta"):
        return None
    if parsed.q is not None:
        return None
    from cardinalsin_spark.operators.rollup import (
        rollup_moment,
        rollup_window_covers,
    )

    best: tuple[int, str] | None = None
    for r, path, subsecond in rollups:
        if rollup_window_covers(r, t_eval - rng, t_eval, subsecond):
            if best is None or r > best[0]:
                best = (r, path)
    if best is None:
        return None
    from cardinalsin_spark.sources.snapshots import read_table_auto

    # a DataFrame target is the engine's fresh='union' shape: rollup
    # rows ∪ downsampled read_changes delta, pre-built at route-list time
    ro = (
        read_table_auto(df.sparkSession, best[1])
        if isinstance(best[1], str)
        else best[1]
    )
    gcols = discover_label_columns(parsed)
    # moment columns gated per shape: a column-poor rollup falls back
    # to raw instead of raising mid-plan (pre-upgrade rollups lack the
    # last/row_count moments and simply never route those shapes)
    need = (
        {cols.name, "bucket", "max_ts", *gcols}
        | {m.label for m in parsed.label_matchers if m.label != "__name__"}
        | (_MOMENT_NEED[agg] if agg is not None else _COUNTER_NEED)
    )
    if not need.issubset(set(ro.columns)):
        return None
    b = F.col("bucket")
    ro = ro.filter(_selector_filter(parsed, cols)).filter(
        (b >= F.timestamp_micros(F.lit(int(round((t_eval - rng) * 1e6)))))
        & (b <= F.timestamp_micros(F.lit(int(round(t_eval * 1e6)))))
    )
    if agg == "last":
        # the window's most recent sample = the last bucket's last_value
        value = F.expr("max_by(last_value, max_ts)")
    elif agg == "present":
        value = F.min(F.lit(1.0))  # a bucket row exists ⇔ samples exist
    elif agg == "count":
        value = F.sum("row_count")  # PromQL count = ALL rows
    elif agg is not None:
        value = rollup_moment(agg)
    else:
        # the instant door's reference counter semantics (MAX−MIN per
        # window, rate/irate divided by the range — _range_fn_value)
        value = F.max("max_value") - F.min("min_value")
        if fn in ("rate", "irate"):
            value = value / F.lit(rng)
    return (
        ro.groupBy(F.col(cols.name), *[F.col(c) for c in gcols])
        .agg(
            F.max("max_ts").alias("timestamp_"),
            value.alias("value"),
        )
        .orderBy(cols.name, *gcols)
    )


def _maybe_route_rollup(
    df: DataFrame,
    rollups: list[tuple[int, object, bool]],
    parsed: ParsedPromQL,
    start_s: float,
    end_s: float,
    step_s: int,
    cols: MetricsCols,
) -> DataFrame | None:
    """Transparent continuous-aggregate serving for the range query's
    generic arm (VERDICT r9 item 2; the reference configures downsampling,
    ``compactor/mod.rs:70-91``, implying rollups serve queries — it never
    implemented either side).

    Routable iff the expression reaching the generic arm is a plain
    selector (per-bucket AVG), a sum/avg/min/max/count aggregation, a
    topk/bottomk aggregation (rank over the per-series per-bucket AVG —
    the raw arm's convention), a moment ``*_over_time`` range function
    in the tumbling shape (``fn(m[step])`` — on this arm the window IS
    the bucket, so the per-bucket moment recomposes exactly) or the
    SLIDING shape (``fn(m[k·step])``, the Grafana smoothing default —
    the window is k whole steps, recomposed by fanning each rollup
    bucket out to the k output steps whose window covers it), or a
    counter function ``rate/irate/increase/delta(m[R])`` at ANY range
    (the reference's hottest generated shape,
    ``api/query/prometheus_api.rs:969-983`` — this arm's window is
    always the step bucket, the range only divides, and the MAX−MIN
    semantics recompose from the max/min moments); the step is a
    multiple of an attached rollup's resolution, the closed bounds cover
    whole rollup buckets (``rollup_covers`` — micros-exact for
    sub-second data), any ``offset`` is a multiple of the rollup
    resolution (the route reads the shifted window and re-aligns
    buckets by +offset, mirroring the raw arm's timestamp shift), and
    the rollup kept every column the result needs (metric name, matcher
    labels, group-by labels).  Anything else returns None and the
    raw-table arm runs unchanged.

    Exactness: min/max/count recompose exactly (so do the MAX−MIN
    counter shapes — max of maxes / min of mins); sum/avg re-add
    per-rollup-bucket float sums, exact whenever the values are (integer
    cents / counts — the determinism doctrine), bit-identical division
    for avg (same global sum / same global count as the raw arm).
    """
    from cardinalsin_spark.operators.rollup import rollup_moment

    if parsed.at_seconds is not None:
        return None
    # `offset` only shifts which samples the raw arm reads (it filters
    # [start−off, end−off] and re-aligns ts by +off before bucketing) —
    # a rollup whose resolution divides the offset serves the shifted
    # window exactly: every shifted rollup bucket still lands wholly in
    # one output step. The yesterday-vs-today dashboard shape.
    off = parsed.offset_seconds or 0.0
    off_us = int(round(off * 1e6))
    agg = parsed.aggregation
    counter_fn = None
    fn = None
    slide_m = 1
    if parsed.function is not None:
        over = (
            parsed.function[: -len("_over_time")]
            if parsed.function.endswith("_over_time")
            else None
        )
        rng = parsed.range_seconds
        if parsed.q is not None or rng is None:
            return None
        if over in ("avg", "min", "max", "sum", "count", "present"):
            # present_over_time recomposes from ANY rollup: a bucket row
            # exists iff the window holds >= 1 sample (same min(lit(1))
            # the raw arm emits)
            if rng == step_s:
                fn = over  # tumbling: window == bucket
            elif rng > step_s and rng % step_s == 0 and over != "present":
                # sliding: window == m whole steps ending at the bucket
                # end — mirrors _range_sliding_moment on the raw arm
                fn = over
                slide_m = rng // step_s
            else:
                return None
        elif over == "last":
            # last_over_time recomposes from the counter-moment pair
            # (last_value at max_ts); tumbling shape only — the raw
            # sliding arm doesn't cover `last`, so neither does routing
            if rng != step_s:
                return None
            fn = "last"
        elif parsed.function in ("rate", "irate", "increase", "delta"):
            # ANY range routes: this arm's window is always the step
            # bucket (the reference's convention — the range only
            # divides rate/irate, _range_fn_value), so the MAX−MIN
            # recomposition is range-independent and the divisor below
            # mirrors the raw arm's `parsed.range_seconds or step`
            counter_fn = parsed.function
        else:
            return None
        gcols = discover_label_columns(parsed)
    elif agg is None:
        fn = "avg"  # the plain-selector arm's per-bucket AVG
        gcols = discover_label_columns(parsed)
    elif (
        agg in ("sum", "avg", "min", "max", "count")
        and parsed.k is None
        and parsed.dst_label is None
        and parsed.q is None
    ):
        fn = agg
        gcols = effective_group_by(parsed, cols)
    elif (
        agg in ("topk", "bottomk")
        and parsed.k is not None
        and parsed.dst_label is None
        and parsed.q is None
    ):
        # per-step top-k ranks each series' per-bucket AVG (the raw
        # arm's selector convention) — the AVG recomposes exactly from
        # the sum/count moments, and the rank's tie-break (value, then
        # the group columns ascending) is deterministic on equal values
        fn = agg
        gcols = effective_group_by(parsed, cols)
    else:
        return None
    best = _best_covering(rollups, start_s, end_s, step_s, off)
    if best is None:
        return None
    from cardinalsin_spark.sources.snapshots import read_table_auto

    # manifest-routed when the rollup is itself a snapshot table (the
    # refresh_rollup shape): a root read would skip the underscore-hidden
    # merge output and serve the stale bootstrap files. A DataFrame
    # target is the engine's fresh='union' real-time shape (rollup rows
    # ∪ downsampled delta moments), used as-is.
    ro = (
        read_table_auto(df.sparkSession, best[1])
        if isinstance(best[1], str)
        else best[1]
    )
    # moment columns gated per shape (a column-poor rollup falls back
    # to raw instead of raising mid-plan); pre-row_count rollups never
    # route counts — the PromQL count is ALL rows, not count(value)
    need = (
        {cols.name, "bucket", *gcols}
        | {m.label for m in parsed.label_matchers if m.label != "__name__"}
        | (_MOMENT_NEED[fn] if fn is not None else _COUNTER_NEED)
    )
    if not need.issubset(set(ro.columns)):
        return None
    b = F.col("bucket")
    ro = ro.filter(_selector_filter(parsed, cols)).filter(
        (b >= F.timestamp_micros(F.lit(int(round(start_s * 1e6)) - off_us)))
        & (b <= F.timestamp_micros(F.lit(int(round(end_s * 1e6)) - off_us)))
    )
    if off_us:
        # re-align shifted buckets onto the query grid, mirroring the
        # raw arm's ts + offset shift (exact integer µs)
        ro = ro.withColumn(
            "bucket",
            F.timestamp_micros(F.unix_micros(b) + F.lit(off_us)),
        )
    if fn in ("topk", "bottomk"):
        # mirror the raw arm's rank exactly: per-(step, metric) window
        # ordered by the per-series AVG then the group columns — the
        # rank<=k filter compiles to WindowGroupLimit over ROLLUP rows
        grouped = ro.groupBy(
            time_bucket(b, step_s).alias("time_bucket"),
            F.col(cols.name),
            *[F.col(c) for c in gcols],
        ).agg(rollup_moment("avg").alias("value"))
        order = F.asc("value") if fn == "bottomk" else F.desc("value")
        w = Window.partitionBy("time_bucket", cols.name).orderBy(
            order, *[F.asc(c) for c in gcols]
        )
        return (
            grouped.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= parsed.k)
            .drop("_rk")
            .orderBy("time_bucket", order, cols.name, *gcols)
        )
    if counter_fn is not None:
        # the generic arm's reference counter semantics: MAX−MIN per
        # window (api/query/prometheus_api.rs:969-997) — max of bucket
        # maxes / min of bucket mins, exact for any tiling; rate/irate
        # divide by the range exactly like _range_fn_value
        value = F.max("max_value") - F.min("min_value")
        if counter_fn in ("rate", "irate"):
            value = value / F.lit(parsed.range_seconds or float(step_s))
    elif fn == "last":
        # the window's most recent sample = the last bucket's last_value
        # (same tuple-max convention as the raw arm's max_by(value, ts))
        value = F.expr("max_by(last_value, max_ts)")
    elif fn == "present":
        value = F.min(F.lit(1.0))  # the raw arm's present_over_time expr
    elif fn == "count":
        value = F.sum("row_count")  # PromQL count = ALL rows
    else:
        value = rollup_moment(fn)
    if slide_m > 1:
        # fan each rollup bucket out to the m output steps whose window
        # covers it (home step i → steps i..i+m−1); the raw arm's
        # _range_sliding_moment fans SAMPLES out the same way, so the
        # grids and window contents match row for row
        i = F.floor(b.cast("double") / F.lit(step_s)).cast("long")
        step_us = step_s * 1_000_000
        j_min = int(round(start_s * 1e6)) // step_us
        j_max = int(round(end_s * 1e6)) // step_us
        ro = ro.withColumn(
            "__j", F.explode(F.sequence(i, i + F.lit(int(slide_m - 1))))
        ).filter((F.col("__j") >= j_min) & (F.col("__j") <= j_max))
        keys = [
            F.timestamp_seconds(F.col("__j") * F.lit(step_s)).alias(
                "time_bucket"
            ),
            F.col(cols.name),
        ] + [F.col(c) for c in gcols]
    else:
        keys = [
            time_bucket(b, step_s).alias("time_bucket"),
            F.col(cols.name),
        ] + [F.col(c) for c in gcols]
    return df_group_sorted(ro, keys, value.alias("value"))


def _maybe_route_rollup_counter(
    df: DataFrame,
    rollups: list[tuple[int, object, bool]],
    parsed: ParsedPromQL,
    start_s: float,
    end_s: float,
    step_s: int,
    cols: MetricsCols,
) -> DataFrame | None:
    """FAITHFUL counter serving from a rollup's counter moments:
    ``rate``/``increase`` with reset-aware PromQL semantics recompose
    exactly from per-bucket ``inc_value`` (the in-bucket reset-aware
    increase) plus the reset-aware boundary delta between consecutive
    rollup buckets of the same series (``first_value``/``last_value``
    pairs; one window over rollup-sized rows) — the deltas the raw path
    sums are partitioned into in-bucket deltas and boundary deltas, and
    both are recoverable, so counter resets anywhere (inside a bucket or
    across a boundary) reproduce bit-for-bit on exactly-representable
    values.

    Guard rails (each miss returns None → the raw faithful arm runs):

    * plain ``rate``/``increase`` with no @/aggregation — ANY range:
      the raw faithful arm buckets by the step and never reads the
      range (``rate_faithful`` sums per-bucket deltas / step), so the
      recomposition is range-independent; an ``offset`` routes when it
      is a multiple of the rollup resolution (the uniform +offset
      shift preserves bucket order, so the lag chain's in-bucket and
      boundary deltas are untouched — only the output grid labels
      move, exactly like the raw arm's timestamp shift);
    * path targets only — a ``fresh='union'`` DataFrame target can hold a
      hot bucket split across two segments with no ordering proof;
    * the rollup carries the counter moments (pre-upgrade rollups don't);
    * the rollup's series identity EQUALS the query's per-series
      partition (metric name + matcher/group labels + the frame's bound
      labels) — a coarser rollup merged distinct series into one delta
      chain and a finer one splits it, either of which changes reset
      detection.
    """
    from cardinalsin_spark.operators.compaction import (
        COUNTER_MOMENT_COLS,
        MOMENT_COLS,
    )

    if parsed.at_seconds is not None:
        return None
    if parsed.aggregation is not None or parsed.q is not None:
        return None
    if parsed.function not in ("rate", "increase"):
        return None
    off = parsed.offset_seconds or 0.0
    off_us = int(round(off * 1e6))
    label_cols = discover_label_columns(parsed)
    series = list(dict.fromkeys([*label_cols, *cols.labels]))
    best = _best_covering(
        rollups, start_s, end_s, step_s, off, paths_only=True
    )
    if best is None:
        return None
    from cardinalsin_spark.sources.snapshots import read_table_auto

    ro = read_table_auto(df.sparkSession, best[1])
    rcols = set(ro.columns)
    if not COUNTER_MOMENT_COLS.issubset(rcols):
        return None
    if rcols - MOMENT_COLS != {cols.name, *series}:
        return None
    b = F.col("bucket")
    ro = ro.filter(_selector_filter(parsed, cols)).filter(
        (b >= F.timestamp_micros(F.lit(int(round(start_s * 1e6)) - off_us)))
        & (b <= F.timestamp_micros(F.lit(int(round(end_s * 1e6)) - off_us)))
    )
    if off_us:
        # +offset re-alignment (the raw arm shifts sample timestamps):
        # a uniform shift preserves bucket order, so the lag chain below
        # sees the same consecutive pairs — only the grid labels move
        ro = ro.withColumn(
            "bucket",
            F.timestamp_micros(F.unix_micros(b) + F.lit(off_us)),
        )
    w = Window.partitionBy(cols.name, *series).orderBy("bucket")
    prev_last = F.lag("last_value").over(w)
    fv = F.col("first_value")
    bnd = F.when(prev_last.isNull(), F.lit(None).cast("double")).otherwise(
        F.when(fv >= prev_last, fv - prev_last).otherwise(fv)
    )
    # NULL contribution ⇔ the bucket contributed no delta at all (single
    # sample, no in-range predecessor) — SUM skips it exactly like the
    # raw arm's SUM over that bucket's (empty) delta set
    contrib = F.when(
        F.col("inc_value").isNull() & bnd.isNull(),
        F.lit(None).cast("double"),
    ).otherwise(
        F.coalesce(F.col("inc_value"), F.lit(0.0))
        + F.coalesce(bnd, F.lit(0.0))
    )
    value = F.sum("__contrib")
    if parsed.function == "rate":
        value = value / F.lit(float(step_s))
    return (
        ro.withColumn("__contrib", contrib)
        .groupBy(
            time_bucket(b, step_s).alias("time_bucket"),
            F.col(cols.name),
            *[F.col(c) for c in series],
        )
        .agg(value.alias("value"))
        .orderBy("time_bucket", cols.name, *series)
    )


def _range_sliding_moment(
    out: DataFrame,
    over: str,
    m: int,
    start_s: float,
    end_s: float,
    step_s: int,
    cols: MetricsCols,
    label_cols: list[str],
) -> DataFrame:
    """Sliding-window moment ``*_over_time`` on the bucket grid: the
    window for the output step ending at ``(j+1)·step`` is the last
    ``m`` whole steps ``[(j−m+1)·step, (j+1)·step)`` — each sample fans
    out to the ``m`` output steps whose window covers it (home step
    ``i`` → steps ``i..i+m−1``), then one hash aggregation per step.
    Output grid stays clamped to the query bounds (steps
    ``floor(start/step)..floor(end/step)``), and only samples inside
    the closed query range participate (early windows are truncated at
    ``start`` — the same truncation the tumbling arm applies).

    Plan shape: the explode multiplies rows by ``m`` BEFORE the
    aggregation — fine for raw scans at modest ``m`` (a 12× fan-out for
    1h windows at 5m steps), and the rollup route fans out rollup-sized
    rows instead (``_maybe_route_rollup`` mirrors this logic bucket-for-
    bucket, so routed == raw bit-for-bit on exactly-representable
    values)."""
    i = F.floor(F.col(cols.ts).cast("double") / F.lit(step_s)).cast("long")
    step_us = step_s * 1_000_000
    j_min = int(round(start_s * 1e6)) // step_us
    j_max = int(round(end_s * 1e6)) // step_us
    ex = out.withColumn(
        "__j", F.explode(F.sequence(i, i + F.lit(int(m - 1))))
    ).filter((F.col("__j") >= j_min) & (F.col("__j") <= j_max))
    value = {
        "avg": F.avg(cols.value),
        "min": F.min(cols.value),
        "max": F.max(cols.value),
        "sum": F.sum(cols.value),
        "count": F.count(F.lit(1)),
    }[over]
    keys = [
        F.timestamp_seconds(F.col("__j") * F.lit(step_s)).alias("time_bucket"),
        F.col(cols.name),
    ] + [F.col(c) for c in label_cols]
    return df_group_sorted(ex, keys, value.alias("value"))


def _range_fn_value(parsed: ParsedPromQL, cols: MetricsCols, rng: float) -> Column:
    """The per-window aggregate for a range FUNCTION (the reference's
    function table, ``api/query/prometheus_api.rs:969-1012``): rate/irate →
    (max−min)/range_seconds, increase/delta → max−min, the *_over_time
    family → its aggregation, anything else → AVG. Shared by the tumbling
    bucket grid (window == bucket) and the pinned ``@`` evaluation (window
    == (pin−range, pin])."""
    if parsed.function in ("rate", "irate"):
        return (F.max(cols.value) - F.min(cols.value)) / F.lit(rng)
    if parsed.function in ("increase", "delta"):
        return F.max(cols.value) - F.min(cols.value)
    if parsed.function is not None and parsed.function.endswith("_over_time"):
        # the *_over_time family (beyond the reference's grammar): plain
        # per-window aggregation of the sampled values
        agg = parsed.function[: -len("_over_time")]
        if agg == "count":
            return F.count(F.lit(1))
        if agg == "present":
            # present_over_time: 1 for any window holding >=1 sample
            return F.min(F.lit(1.0))
        if agg == "last":
            # most recent sample in the window (deterministic: ties broken
            # by the value itself, like max_by's tuple comparison)
            return F.expr(f"max_by({cols.value}, {cols.ts})")
        if agg == "mad":
            # mad_over_time (PromQL experimental fn): median(|v − median|)
            # per window. Two-pass over one collected array — the
            # 1-element-array transform trick binds the sorted array to a
            # lambda var so it's computed once; medians use the
            # percentile_cont 0.5 interpolation ((a+b)/2 — exact on the
            # integer-cents grid, bit-matching DuckDB, the ts_mad
            # contract). State is the window's sample list: bounded by
            # samples-per-series-per-window like quantile_over_time.
            return F.expr(_mad_expr(cols.value))
        return _agg_column(agg, cols.value, parsed.q)
    # idelta/deriv/resets/changes/... → AVG: the reference's documented
    # range-grid degradation (api/query/prometheus_api.rs:998-1012),
    # reachable only with faithful=False on the bucket grid. The instant
    # and @-pinned paths route these to _instant_range_fn_faithful instead
    # (no reference instant analogue exists to be compatible with).
    return F.avg(cols.value)


def _instant_range_fn_faithful(
    win: DataFrame, parsed: ParsedPromQL, cols: MetricsCols, t_eval: float
) -> DataFrame:
    """Faithful instant evaluation of resets/changes/idelta/deriv/
    predict_linear over the window [T − range, T] (VERDICT r9 item 5 —
    these previously degraded to a silent per-window AVG).

    resets/changes walk consecutive-sample pairs of the time-sorted
    window (state: the window's sample list per series, the same bound as
    quantile_over_time); idelta is the last two samples' difference;
    deriv/predict_linear run the least-squares regression with x relative
    to the evaluation time (upstream ``linearRegression(samples,
    enh.Ts)``: intercept at T, predicted = intercept + slope·horizon) —
    plain sum aggregates, no collected state. Series with too few samples
    drop (upstream emits nothing), ties on a timestamp break by value
    (array_sort struct comparison / the lag tiebreak convention)."""
    labels = discover_label_columns(parsed)
    keys = [F.col(cols.name)] + [F.col(c) for c in labels]
    fn = parsed.function
    if fn in ("deriv", "predict_linear"):
        x = F.unix_micros(F.col(cols.ts)) / F.lit(1e6) - F.lit(float(t_eval))
        y = F.col(cols.value).cast("double")
        agg = (
            win.groupBy(*keys)
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.max(cols.ts).alias("timestamp_"),
                F.sum(x).alias("_sx"),
                F.sum(y).alias("_sy"),
                F.sum(x * y).alias("_sxy"),
                F.sum(x * x).alias("_sxx"),
            )
            .filter(F.col("_n") >= 2)
        )
        n = F.col("_n").cast("double")
        slope = (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / (
            n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
        )
        if fn == "deriv":
            value = slope
        else:
            intercept = F.col("_sy") / n - slope * (F.col("_sx") / n)
            value = intercept + slope * F.lit(
                float(parsed.predict_ahead_s or 0)
            )
        return agg.select(
            cols.name, *labels, "timestamp_", value.alias("value")
        ).orderBy(cols.name, *labels)
    arr = (
        f"array_sort(collect_list(struct({cols.ts} as t, "
        f"{cols.value} as v)))"
    )
    base = win.groupBy(*keys).agg(
        F.expr(arr).alias("_a"), F.max(cols.ts).alias("timestamp_")
    )
    deltas = (
        "zip_with(slice(_a, 1, size(_a) - 1), slice(_a, 2, size(_a) - 1), "
        "(x, y) -> y.v - x.v)"
    )
    if fn == "resets":
        value = F.expr(f"size(filter({deltas}, d -> d < 0))").cast("double")
    elif fn == "changes":
        value = F.expr(f"size(filter({deltas}, d -> d != 0))").cast("double")
    else:  # idelta
        base = base.filter(F.size("_a") >= 2)
        value = F.expr("element_at(_a, -1).v - element_at(_a, -2).v").cast(
            "double"
        )
    return base.select(
        cols.name, *labels, "timestamp_", value.alias("value")
    ).orderBy(cols.name, *labels)


def _replicate_over_grid(
    inst: DataFrame, spark: SparkSession, start_s: float, end_s: float, step_s: int
) -> DataFrame:
    """Replicate a pinned instant vector across the [start, end] bucket
    grid (`@`-modifier range semantics: every grid step evaluates at the
    same fixed time). The grid is tiny (bounded step count) — broadcast
    it; the instant vector stays distributed."""
    keys = [c for c in inst.columns if c != "value"]
    b0, b1 = int(start_s // step_s), int(end_s // step_s)
    grid = spark.range(b0, b1 + 1).select(
        F.timestamp_seconds((F.col("id") * step_s).cast("long")).alias(
            "time_bucket"
        )
    )
    return inst.crossJoin(F.broadcast(grid)).select(
        "time_bucket", *keys, "value"
    ).orderBy("time_bucket", *keys)


def _split_label_fn_args(argstr: str) -> tuple[str, list[str]]:
    """Split `label_replace`/`label_join` arguments at top level: the first
    argument is a vector expression (may contain commas inside parens/braces),
    the rest are quoted string literals."""
    parts: list[str] = []
    depth = 0
    in_str: str | None = None
    cur: list[str] = []
    for ch in argstr:
        if in_str:
            cur.append(ch)
            if ch == in_str:
                in_str = None
            continue
        if ch in "\"'":
            in_str = ch
            cur.append(ch)
        elif ch in "({[":
            depth += 1
            cur.append(ch)
        elif ch in ")}]":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur).strip())
    inner, raw_args = parts[0], parts[1:]
    return inner, [a.strip().strip('"') for a in raw_args]


def _apply_label_fn(res: DataFrame, fn: str, args: list[str]) -> DataFrame:
    """Post-transform for the label-manipulation functions (Prometheus
    semantics; the reference implements no functions at all):

    - ``label_replace(v, dst, repl, src, regex)``: if ``regex`` full-matches
      ``src``, set ``dst`` to ``repl`` with ``$n`` group expansion, else the
      series is unchanged (``dst`` keeps its value, or the original ``src``
      row passes through untouched).
    - ``label_join(v, dst, sep, src...)``: ``dst = concat_ws(sep, src...)``.
    """
    if fn == "label_replace":
        dst, repl, src, regex = args
        anchored = f"^(?:{regex})$"
        existing = F.col(dst) if dst in res.columns else F.lit("")
        return res.withColumn(
            dst,
            F.when(
                F.col(src).rlike(anchored),
                F.regexp_replace(F.col(src), anchored, repl),
            ).otherwise(existing),
        )
    dst, sep, *srcs = args
    return res.withColumn(dst, F.concat_ws(sep, *[F.col(s) for s in srcs]))


def df_group_sorted(df: DataFrame, keys: list[Column], value: Column) -> DataFrame:
    grouped = df.groupBy(*keys).agg(value)
    order_cols = [c for c in grouped.columns if c != "value"]
    return grouped.orderBy(*order_cols)


def _promql_range_faithful(
    out: DataFrame,
    parsed: ParsedPromQL,
    step_s: int,
    cols: MetricsCols,
    label_cols: list[str],
    ts_ns_col: str,
    faithful: bool | str = True,
) -> DataFrame:
    """Faithful range-function dispatch: inner per-series evaluation via the
    counter-reset-aware operators, optional outer aggregation across series.
    ``faithful="extrapolated"`` upgrades rate to the upstream
    extrapolatedRate algorithm (boundary extrapolation + zero-clamp)."""
    from cardinalsin_spark.operators.timeseries import (
        deriv_bucketed,
        increase_faithful,
        irate_faithful,
        predict_linear_bucketed,
        rate_faithful,
        resets_changes_bucketed,
    )

    series = list(dict.fromkeys([*label_cols, *cols.labels]))
    needs_ns = (
        "irate", "deriv", "idelta", "delta",
        "resets", "changes", "predict_linear", "holt_winters",
    ) + (("rate",) if faithful == "extrapolated" else ())
    if parsed.function in needs_ns and ts_ns_col not in out.columns:
        out = out.withColumn(
            ts_ns_col,
            F.unix_micros(F.col(cols.ts).cast("timestamp")) * F.lit(1_000),
        )
    if parsed.function == "rate" and faithful == "extrapolated":
        from cardinalsin_spark.operators.timeseries import rate_extrapolated

        res, vcol = (
            rate_extrapolated(
                out, step_s, series=series, cols=cols, ts_ns_col=ts_ns_col
            ),
            "rate",
        )
    elif parsed.function == "rate":
        res, vcol = rate_faithful(out, step_s, series=series, cols=cols), "rate"
    elif parsed.function == "increase":
        res, vcol = (
            increase_faithful(out, step_s, series=series, cols=cols),
            "increase",
        )
    elif parsed.function == "irate":
        res, vcol = (
            irate_faithful(out, step_s, series=series, cols=cols, ts_ns_col=ts_ns_col),
            "irate",
        )
    elif parsed.function == "idelta":
        from cardinalsin_spark.operators.timeseries import idelta_faithful

        res, vcol = (
            idelta_faithful(
                out, step_s, series=series, cols=cols, ts_ns_col=ts_ns_col
            ),
            "idelta",
        )
    elif parsed.function == "delta":
        from cardinalsin_spark.operators.timeseries import delta_faithful

        res, vcol = (
            delta_faithful(
                out, step_s, series=series, cols=cols, ts_ns_col=ts_ns_col
            ),
            "delta",
        )
    elif parsed.function in ("resets", "changes"):
        res, vcol = (
            resets_changes_bucketed(
                out,
                step_s,
                series=series,
                by=[cols.name, *series],
                cols=cols,
                ts_ns_col=ts_ns_col,
            ),
            parsed.function,
        )
    elif parsed.function == "holt_winters":
        from cardinalsin_spark.operators.timeseries import holt_winters_bucketed

        res, vcol = (
            holt_winters_bucketed(
                out,
                step_s,
                sf=parsed.hw_sf or 0.3,
                tf=parsed.hw_tf or 0.3,
                series=series,
                cols=cols,
                ts_ns_col=ts_ns_col,
            ),
            "hw",
        )
    elif parsed.function == "predict_linear":
        res, vcol = (
            predict_linear_bucketed(
                out,
                step_s,
                parsed.predict_ahead_s or 0,
                series=series,
                cols=cols,
                ts_ns_col=ts_ns_col,
            ),
            "predicted",
        )
    else:
        res, vcol = (
            deriv_bucketed(out, step_s, series=series, cols=cols, ts_ns_col=ts_ns_col),
            "deriv",
        )
    res = res.withColumnRenamed("bucket", "time_bucket").withColumnRenamed(
        vcol, "value"
    )
    if parsed.aggregation:
        keys = ["time_bucket", cols.name, *effective_group_by(parsed, cols)]
        return (
            res.groupBy(*keys)
            .agg(_agg_column(parsed.aggregation, "value").alias("value"))
            .orderBy(*keys)
        )
    return res.select("time_bucket", cols.name, *series, "value").orderBy(
        "time_bucket", cols.name, *series
    )


# le value standing in for +Inf in cumulative-bucket frames (sorts after
# every finite bound; arithmetic on it is guarded behind CASE branches).
LE_INF = 2**62


def _le_micros() -> F.Column:
    """``le`` label string → exact micros on an integer grid ("0.5" →
    500000, "250" → 250000000, "+Inf" → LE_INF) — fractional bucket
    bounds (the normal Prometheus seconds-unit instrumentation) stay on
    the exact-integer interpolation path. DECIMAL(32,6) parses any
    decimal spelling down to 10⁻⁶ exactly; a garbage label raises under
    ANSI instead of silently pruning the bucket."""
    return F.when(F.col("le") == "+Inf", F.lit(LE_INF)).otherwise(
        F.expr("CAST(CAST(le AS DECIMAL(32,6)) * 1000000 AS BIGINT)")
    )


def histogram_quantile_cumulative(
    buckets: DataFrame,
    q_num: int,
    q_den: int,
    group_cols: list[str],
    le_col: str = "le",
    cum_col: str = "cum",
    value_alias: str = "value",
    out_scale: float = 1_000_000.0,
    le_prescale: int = 1,
) -> DataFrame:
    """PromQL ``histogram_quantile(q, m_bucket)`` over a cumulative-bucket
    frame: one row per (group, le) with the cumulative count ``cum`` of
    samples <= le, including an ``LE_INF`` row (reference parses
    histogram_quantile but AVG-degrades it,
    ``api/query/prometheus_api.rs:998-1012``; this is the real algorithm,
    promql/quantile.go upstream).

    Per group: find the lowest bucket whose cumulative count reaches
    q·total (compared as ``q_den·cum >= q_num·total`` — exact integers, no
    float rank), then interpolate linearly inside it:
    ``lo + (le−lo)·(q·total − cum_prev)/(cum − cum_prev)``. Falls back to
    the highest finite bound when the quantile lands in the +Inf bucket
    (Prometheus semantics). The interpolation is floored onto a 10⁻⁶ grid
    in exact int64 before ONE float division by ``out_scale``, so results
    hash-match across engines.

    ``le_prescale=S`` declares that the ``le`` values arrive multiplied
    by S (the engine's PromQL paths pass bounds in exact micros, S=10⁶,
    so FRACTIONAL bucket bounds — the normal Prometheus seconds-unit
    instrumentation — stay on an integer grid). The interpolation is
    linear in le and the 10⁶ micro-grid multiplier divides down by S
    before the single integer division, so results are bit-identical to
    the unscaled path for bounds expressible at both scales.

    Plan: two stacked windows on the group key (max + lag share a single
    shuffle), then a filter — no UDFs, no collect.
    """
    if 1_000_000 % le_prescale:
        raise ValueError(f"le_prescale must divide 1e6, got {le_prescale}")
    mult = 1_000_000 // le_prescale
    g = Window.partitionBy(*group_cols)
    w = g.orderBy(le_col)
    le = F.col(le_col)
    cum = F.col(cum_col)
    annotated = (
        buckets.withColumn("_total", F.max(cum).over(g))
        .withColumn("_prev_cum", F.coalesce(F.lag(cum).over(w), F.lit(0)))
        .withColumn("_prev_le", F.lag(le).over(w))
        .withColumn(
            "_rank_ok",
            (F.lit(q_den) * cum.cast("decimal(38,0)"))
            >= (F.lit(q_num) * F.col("_total").cast("decimal(38,0)")),
        )
    )
    hit = (
        annotated.filter(F.col("_rank_ok") & (F.col("_total") > 0))
        .withColumn(
            "_rn", F.row_number().over(w)
        )
        .filter(F.col("_rn") == 1)
    )
    cnt = cum - F.col("_prev_cum")
    # DECIMAL(38,0) through the numerator: le·q_den·count·10⁶ passes 2^63
    # once cumulative counts reach ~1e9 (the 100 TB regime) — int64 would
    # wrap silently while DuckDB HUGEINT-promotes, splitting the engines
    interp_micro = F.expr(
        f"(CAST(coalesce(_prev_le, 0) AS DECIMAL(38,0)) * {q_den}"
        f" * ({cum_col} - _prev_cum)"
        f" + CAST({le_col} - coalesce(_prev_le, 0) AS DECIMAL(38,0))"
        f" * (CAST({q_num} AS DECIMAL(38,0)) * _total"
        f"    - CAST({q_den} AS DECIMAL(38,0)) * _prev_cum))"
        f" * {mult} div (CAST({q_den} AS DECIMAL(38,0))"
        f" * ({cum_col} - _prev_cum))"
    )
    micro = (
        F.when(le >= F.lit(LE_INF), F.col("_prev_le") * F.lit(mult))
        .when(cnt > 0, interp_micro)
        .otherwise(F.lit(None))
    )
    return (
        hit.withColumn(value_alias, micro.cast("double") / F.lit(out_scale))
        .select(*group_cols, value_alias)
        .orderBy(*group_cols)
    )


def cumulative_le_buckets(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    les: list[int],
    le_col: str = "le",
    cum_col: str = "cum",
) -> DataFrame:
    """Build the classic-histogram cumulative-bucket frame — one row per
    (group, le) with the count of samples ``<= le``, +Inf row included —
    from raw samples.

    Scale shape: each sample is assigned its SMALLEST covering bound with
    one CASE chain (no join), so the aggregation shuffle carries every
    row ONCE — not once per bucket bound, which is what a crossJoin
    against the le dimension costs (x(n_buckets) shuffle width; measured
    1.4x wall-clock on the quantile row at 7 bounds, sf0.1, and the gap
    widens with bound count). The per-group bucket grid is
    densified AFTER aggregation (group-count x n_buckets rows, broadcast
    join against the tiny le dimension) and the cumulative sum is one
    window over the grid."""
    bounds = sorted(les)
    assign = F.lit(LE_INF)
    for b in reversed(bounds):
        assign = F.when(F.col(value_col) <= F.lit(b), F.lit(b)).otherwise(
            assign
        )
    counts = (
        # a NULL sample is no sample: without the filter the when-chain
        # falls through and silently counts it into the +Inf bucket
        # (same defect class as the r7 KMV null slot)
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, assign.alias(le_col))
        .groupBy(*group_cols, le_col)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    # Arrow path for the literal le dimension (OPTIMIZATION r14, the
    # _union_find_components fix): a plain Python list parallelizes into
    # defaultParallelism pickled partitions, so building this ~8-row
    # broadcast cost a fleet of Python-serialization tasks per query
    import pandas as pd

    le_df = F.broadcast(
        counts.sparkSession.createDataFrame(
            pd.DataFrame({le_col: [int(v) for v in bounds + [LE_INF]]}),
            f"{le_col} LONG",
        )
    )
    grid = counts.select(*group_cols).distinct().crossJoin(le_df)
    dense = grid.join(counts, [*group_cols, le_col], "left").withColumn(
        "_n", F.coalesce(F.col("_n"), F.lit(0))
    )
    w = Window.partitionBy(*group_cols).orderBy(le_col)
    return dense.withColumn(cum_col, F.sum("_n").over(w)).drop("_n")


def histogram_fraction_cumulative(
    buckets: DataFrame,
    lo: int,
    hi: int,
    group_cols: list[str],
    le_col: str = "le",
    cum_col: str = "cum",
    value_alias: str = "value",
    out_scale: float = 1_000_000.0,
) -> DataFrame:
    """PromQL ``histogram_fraction(lo, hi, m_bucket)`` over the same
    cumulative-bucket frame as :func:`histogram_quantile_cumulative`: the
    estimated fraction of observations in (lo, hi], by linear
    interpolation of the cumulative count at each threshold
    (promql/histogram.go upstream; the reference parses no histogram
    functions at all). ``lo``/``hi`` are integers on the bucket-bound
    grid's unit (the same unit as ``le``), ``0 <= lo < hi``.

    Per group and threshold x: the first bucket with ``le >= x`` gives
    ``F(x) = cum_prev + (x − le_prev)·count/width`` as an exact rational
    (numerator/denominator in int64); x landing in the +Inf bucket yields
    ``F = total``. The fraction ``(F(hi) − F(lo))/total`` combines the two
    rationals in DECIMAL(38,0), clamps to [0, 1], and floors onto a 10⁻⁶
    grid before ONE float division — hash-matching across engines, same
    discipline as the quantile.

    Plan: one window pass annotates prev/total, two per-group
    first-bucket filters join back on the group key — no UDFs.
    """
    if not (0 <= lo < hi):
        raise ValueError(f"need 0 <= lo < hi, got ({lo}, {hi})")
    g = Window.partitionBy(*group_cols)
    w = g.orderBy(le_col)
    le = F.col(le_col)
    cum = F.col(cum_col)
    annotated = (
        buckets.withColumn("_total", F.max(cum).over(g))
        .withColumn("_prev_cum", F.coalesce(F.lag(cum).over(w), F.lit(0)))
        .withColumn("_prev_le", F.coalesce(F.lag(le).over(w), F.lit(0)))
    )

    def threshold_frame(x: int, tag: str) -> DataFrame:
        hit = (
            annotated.filter((le >= F.lit(x)) & (F.col("_total") > 0))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
        )
        width = le - F.col("_prev_le")
        num = F.when(
            le >= F.lit(LE_INF), F.col("_total").cast("decimal(38,0)")
        ).otherwise(
            F.col("_prev_cum").cast("decimal(38,0)") * width
            + (F.lit(x) - F.col("_prev_le")).cast("decimal(38,0)")
            * (cum - F.col("_prev_cum"))
        )
        den = F.when(le >= F.lit(LE_INF), F.lit(1).cast("decimal(38,0)")).otherwise(
            width.cast("decimal(38,0)")
        )
        return hit.select(
            *group_cols,
            num.alias(f"_n_{tag}"),
            den.alias(f"_d_{tag}"),
            F.col("_total").alias(f"_t_{tag}"),
        )

    flo = threshold_frame(lo, "lo")
    fhi = threshold_frame(hi, "hi")
    joined = fhi.join(flo, group_cols)
    numer = (
        F.col("_n_hi") * F.col("_d_lo") - F.col("_n_lo") * F.col("_d_hi")
    )
    denom = F.col("_d_hi") * F.col("_d_lo") * F.col("_t_hi").cast(
        "decimal(38,0)"
    )
    clamped = F.greatest(
        F.lit(0).cast("decimal(38,0)"), F.least(numer, denom)
    )
    micro = F.expr(
        "CAST((CAST(_numer AS DECIMAL(38,0)) * 1000000)"
        " div CAST(_denom AS DECIMAL(38,0)) AS BIGINT)"
    )
    return (
        joined.withColumn("_numer", clamped)
        .withColumn("_denom", denom)
        .withColumn(value_alias, micro.cast("double") / F.lit(out_scale))
        .select(*group_cols, value_alias)
        .orderBy(*group_cols)
    )


def exp_histogram_quantile(
    buckets: DataFrame,
    q: float,
    group_cols: list[str],
    scale_col: str = "scale",
    idx_col: str = "idx",
    sign_col: str = "sign",
    count_col: str = "cnt",
    value_alias: str = "value",
) -> DataFrame:
    """Quantile over OTLP exponential-histogram buckets (the
    ``histogram_buckets=True`` ingest shape: one row per non-empty bucket
    with ``scale``/``idx``/``sign`` in {pos, neg, zero} and the
    NON-cumulative count). Bucket ``idx`` at scale ``s`` covers
    ``(2^(idx/2^s), 2^((idx+1)/2^s)]`` for ``sign=pos`` and its mirror
    for ``neg``; the zero bucket collapses to 0. Buckets order by true
    value (negatives by descending idx), the running count locates the
    rank bucket, and the estimate interpolates linearly inside it — the
    native-histogram analogue of ``histogram_quantile_cumulative``.

    Scale note: ``2^(k/2^s)`` needs ``pow`` — libm-dependent for
    ``s > 0``, exact powers of two for ``s <= 0`` — so this operator is
    deliberately outside the oracle-checked tier (same rule as the
    exp/ln convenience functions). Assumes one scale per group (the
    ingest stamps ``scale`` as a label; group by it or rescale first).
    """
    if not (0.0 <= q <= 1.0):
        raise ValueError(f"quantile must be in [0, 1], got {q}")
    sgn = F.col(sign_col)
    idx = F.col(idx_col).cast("double")
    cnt = F.col(count_col)
    order1 = F.when(sgn == "neg", -1).when(sgn == "zero", 0).otherwise(1)
    order2 = F.when(sgn == "neg", -idx).when(sgn == "zero", F.lit(0.0)).otherwise(idx)
    g = Window.partitionBy(*group_cols)
    w = g.orderBy(order1, order2)
    inv = F.pow(F.lit(2.0), -F.col(scale_col).cast("double"))  # 1/2^scale
    lo_pos = F.pow(F.lit(2.0), idx * inv)
    hi_pos = F.pow(F.lit(2.0), (idx + 1) * inv)
    annotated = (
        buckets.withColumn("_cum", F.sum(cnt).over(w))
        .withColumn("_total", F.sum(cnt).over(g))
        .withColumn("_rank", F.lit(float(q)) * F.col("_total"))
    )
    hit = (
        annotated.filter(
            (F.col("_cum") >= F.col("_rank")) & (F.col("_total") > 0)
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    into = (F.col("_rank") - (F.col("_cum") - cnt)) / cnt
    value = (
        F.when(sgn == "zero", F.lit(0.0))
        .when(sgn == "pos", lo_pos + (hi_pos - lo_pos) * into)
        .otherwise(-hi_pos + (hi_pos - lo_pos) * into)
    )
    return (
        hit.withColumn(value_alias, value)
        .select(*group_cols, value_alias)
        .orderBy(*group_cols)
    )


def _route_exp_histogram_quantile(
    df: DataFrame,
    parsed: ParsedPromQL,
    q: float | None,
    cols: MetricsCols,
    time_s: float | None = None,
    start_s: float | None = None,
    end_s: float | None = None,
    step_s: int | None = None,
    frac: tuple[float, float] | None = None,
) -> DataFrame:
    """``histogram_quantile(φ, {base}_exp_bucket)`` — and, with ``frac``,
    ``histogram_fraction(lo, hi, {base}_exp_bucket)`` — from PromQL text
    (VERDICT r9 item 4 — previously the engine API was the only door):
    selects the ``{base}_exp_bucket`` + ``{base}_exp_zero`` family rows
    (the bucket-preserving exponential ingest shape), takes the latest
    count per (series, scale, idx, sign) — per grid step in range mode —
    and runs ``exp_histogram_quantile`` per (series, scale), exactly the
    engine-API convention, so both doors answer bit-identically.

    ``le`` never joins the series key: it is the CLASSIC family's
    structure label (null on every exp row); grouping on it would only
    add a constant-null output column.  Offset/@ loud-reject — the
    modifiers are supported on the classic path and nobody should get a
    silently unshifted exponential answer."""
    import dataclasses

    if parsed.offset_seconds or parsed.at_seconds is not None:
        raise ValueError(
            "offset/@ modifiers are not supported on exponential-bucket "
            "histogram_quantile; evaluate at an explicit time instead"
        )
    for c in ("scale", "idx", "sign"):
        if c not in df.columns:
            raise ValueError(
                f"exp-bucket family {parsed.metric_name!r} needs the {c!r} "
                "label column (the histogram_buckets=True ingest shape)"
            )
    base = parsed.metric_name[: -len("_exp_bucket")]
    p2 = dataclasses.replace(
        parsed,
        metric_name=None,
        label_matchers=[
            m for m in parsed.label_matchers if m.label != "__name__"
        ],
    )
    sel = df.filter(
        F.col(cols.name).isin(parsed.metric_name, f"{base}_exp_zero")
    ).filter(_selector_filter(p2, cols))
    from cardinalsin_spark.schema import CORE_COLUMNS

    non_labels = set(CORE_COLUMNS) | {
        "date", "hour", "value", "ts_ns", cols.ts, cols.name, cols.value,
        "scale", "idx", "sign", "le",
    }
    series = [c for c in sel.columns if c not in non_labels]
    if step_s is None:  # instant convention: latest state at time_s
        if time_s is not None:
            sel = sel.filter(
                F.col(cols.ts) <= F.timestamp_seconds(F.lit(time_s))
            )
            sel = _ns_prefilter(sel, None, time_s)
        latest = sel.groupBy(cols.name, *series, "scale", "idx", "sign").agg(
            F.expr(f"max_by({cols.value}, {cols.ts})").alias("cnt")
        )
        group = [*series, "scale"]
    else:  # range grid: latest state per step
        sel = sel.filter(
            (F.col(cols.ts) >= F.timestamp_seconds(F.lit(start_s)))
            & (F.col(cols.ts) <= F.timestamp_seconds(F.lit(end_s)))
        )
        sel = _ns_prefilter(sel, start_s, end_s)
        latest = sel.groupBy(
            time_bucket(cols.ts, step_s).alias("time_bucket"),
            F.col(cols.name),
            *series,
            "scale",
            "idx",
            "sign",
        ).agg(F.expr(f"max_by({cols.value}, {cols.ts})").alias("cnt"))
        group = ["time_bucket", *series, "scale"]
    latest = (
        latest.withColumn(
            "sign",
            F.when(
                F.col(cols.name) == f"{base}_exp_zero", F.lit("zero")
            ).otherwise(F.col("sign")),
        )
        .withColumn("idx", F.col("idx").cast("long"))
        .withColumn("scale", F.col("scale").cast("int"))
    )
    if frac is not None:
        return exp_histogram_fraction(latest, frac[0], frac[1], group)
    return exp_histogram_quantile(latest, q, group)


def exp_histogram_fraction(
    buckets: DataFrame,
    lo: float,
    hi: float,
    group_cols: list[str],
    scale_col: str = "scale",
    idx_col: str = "idx",
    sign_col: str = "sign",
    count_col: str = "cnt",
    value_alias: str = "value",
) -> DataFrame:
    """Fraction of observations in ``(lo, hi]`` over exponential-histogram
    buckets (the same scale/idx/sign row shape as
    :func:`exp_histogram_quantile`): per threshold, buckets wholly below
    contribute their full count, the bucket containing the threshold
    contributes linearly (upstream promql/histogram.go convention), and
    the fraction is the difference over the total. ``0 <= lo < hi`` like
    the classic path; the zero bucket is a point mass at 0 (counted at
    any threshold ≥ 0), negative buckets sit wholly below 0. Same libm
    rule as the quantile (``2^(k/2^s)`` needs ``pow``) — outside the
    oracle tier, exact at ``scale <= 0``. Groups with zero total yield
    NaN (0/0), the upstream convention."""
    if not (0 <= lo < hi):
        raise ValueError(f"need 0 <= lo < hi, got ({lo}, {hi})")
    sgn = F.col(sign_col)
    idx = F.col(idx_col).cast("double")
    cnt = F.col(count_col)
    inv = F.pow(F.lit(2.0), -F.col(scale_col).cast("double"))
    lo_pos = F.pow(F.lit(2.0), idx * inv)
    hi_pos = F.pow(F.lit(2.0), (idx + 1) * inv)
    b_lo = (
        F.when(sgn == "zero", F.lit(0.0))
        .when(sgn == "pos", lo_pos)
        .otherwise(-hi_pos)
    )
    b_hi = (
        F.when(sgn == "zero", F.lit(0.0))
        .when(sgn == "pos", hi_pos)
        .otherwise(-lo_pos)
    )

    def cum_at(x: float):
        xl = F.lit(float(x))
        return F.sum(
            F.when(b_hi <= xl, cnt)
            .when(b_lo >= xl, F.lit(0.0))
            .otherwise(cnt * (xl - b_lo) / (b_hi - b_lo))
        )

    return (
        buckets.groupBy(*group_cols)
        .agg(((cum_at(hi) - cum_at(lo)) / F.sum(cnt)).alias(value_alias))
        .orderBy(*group_cols)
    )


def _median_of(arr: str) -> str:
    """SQL fragment: percentile_cont(0.5) over an already-sorted array —
    (a[(n−1) div 2] + a[n div 2]) / 2, 1-based element_at. Exact on
    integer grids (sum of two ≤2^52 ints halved is representable)."""
    return (
        f"(element_at({arr}, CAST((size({arr}) - 1) / 2 AS INT) + 1)"
        f" + element_at({arr}, CAST(size({arr}) / 2 AS INT) + 1)) / 2"
    )


def _mad_expr(value_col: str) -> str:
    """Single-aggregate MAD: sort the collected values once (bound to a
    lambda var via the 1-element-array transform idiom — Spark SQL has no
    let), take the median, re-sort absolute deviations, median again.

    Memory: the ``collect_list`` buffer grows with the GROUP ROW COUNT —
    fine for this expression's consumers (``mad_over_time`` range
    windows, bounded by window duration × scrape interval) but NOT for
    unbounded groups; those use :func:`_mad_grid_expr` over a
    counts-per-value grid instead (OPTIMIZATION r15, VERDICT r14 item
    4)."""
    inner = _median_of("a")
    outer = _median_of("d")
    # NB: [0] subscripts are Spark's 0-based GetArrayItem (element_at is
    # the 1-based accessor used inside _median_of)
    return (
        f"transform(array(array_sort(collect_list({value_col}))), a -> "
        f"transform(array(array_sort(transform(a, x -> abs(x - {inner})))),"
        f" d -> {outer})[0])[0]"
    )


def _rank_walk(arr: str, r: str) -> str:
    """SQL fragment: the value at 1-based rank ``r`` of a (v, c)-struct
    array sorted by v — a linear cumulative-count walk, the weighted
    analogue of ``element_at(a, r)``."""
    return (
        f"aggregate({arr},"
        f" named_struct('cum', 0L, 'val', CAST(NULL AS BIGINT)),"
        f" (acc, s) -> CASE WHEN acc.val IS NOT NULL THEN acc"
        f" WHEN acc.cum + s.c >= {r}"
        f" THEN named_struct('cum', acc.cum + s.c, 'val', s.v)"
        f" ELSE named_struct('cum', acc.cum + s.c, 'val', acc.val) END,"
        f" acc -> acc.val)"
    )


def _mad_grid_expr(value_col: str, cnt_col: str) -> str:
    """MAD over a pre-aggregated (integer value, count) GRID — the
    memory-bounded form of :func:`_mad_expr` for unbounded groups
    (OPTIMIZATION r15, VERDICT r14 item 4): the aggregation buffer holds
    one struct per DISTINCT value (the cents grid), not one element per
    row, so a hot group of billions of rows costs grid-sized state.

    Shape: collect the sorted (v, c) pairs, total n = Σc, take the two
    median ranks by cumulative-count walk (``med2 = v(r1) + v(r2)`` —
    twice the median, kept integral), re-sort the grid by the integral
    doubled deviations ``|2v − med2|``, walk the same two ranks, divide
    by 4. Bit-equal to ``_mad_expr`` over the exploded rows: on the
    integer grid every intermediate is an exact dyadic double
    (tests/test_r15_equivalence.py pins it). NULL values are excluded
    from the ranks exactly as ``collect_list`` drops them."""
    r1 = "((n - 1) div 2) + 1"
    r2 = "(n div 2) + 1"
    med2 = f"({_rank_walk('g', r1)} + {_rank_walk('g', r2)})"
    mad4 = f"({_rank_walk('d', r1)} + {_rank_walk('d', r2)})"
    return (
        f"transform(array(filter(array_sort(collect_list(named_struct("
        f"'v', {value_col}, 'c', {cnt_col}))), s -> s.v IS NOT NULL)), g -> "
        f"transform(array(aggregate(g, 0L, (a, s) -> a + s.c)), n -> "
        f"transform(array({med2}), m -> "
        f"transform(array(array_sort(transform(g, s -> "
        f"named_struct('v', abs(2 * s.v - m), 'c', s.c)))), d -> "
        f"CAST({mad4} AS DOUBLE) / 4.0"
        f")[0])[0])[0])[0]"
    )


def _apply_scalar_fn(res: DataFrame, fn: str, args: list[str]) -> DataFrame:
    """Value-transforming scalar wrappers over an instant vector (PromQL
    functions the reference lacks entirely): clamp family, abs/ceil/floor/
    sgn, and the sort/sort_desc ordering functions. All single built-in
    expressions on the value column — no extra shuffle except the global
    sort for sort/sort_desc (which is the function's semantics)."""
    v = F.col("value")
    if fn == "clamp":
        lo, hi = float(args[0]), float(args[1])
        # PromQL: min > max -> empty vector
        if lo > hi:
            return res.filter(F.lit(False))
        return res.withColumn("value", F.least(F.greatest(v, F.lit(lo)), F.lit(hi)))
    if fn == "clamp_min":
        return res.withColumn("value", F.greatest(v, F.lit(float(args[0]))))
    if fn == "clamp_max":
        return res.withColumn("value", F.least(v, F.lit(float(args[0]))))
    if fn == "abs":
        return res.withColumn("value", F.abs(v))
    if fn == "ceil":
        return res.withColumn("value", F.ceil(v).cast("double"))
    if fn == "floor":
        return res.withColumn("value", F.floor(v).cast("double"))
    if fn == "sgn":
        return res.withColumn("value", F.signum(v))
    if fn == "sqrt":
        # IEEE-754 sqrt is correctly rounded — deterministic across
        # engines, unlike the transcendental tier below
        return res.withColumn("value", F.sqrt(v))
    if fn in ("exp", "ln", "log2", "log10"):
        # CONVENIENCE TIER — libm-dependent (not correctly rounded by
        # IEEE-754), so these stay out of every oracle-checked registry
        # path per the determinism doctrine (SCALE.md); semantics follow
        # upstream promql/functions.go (simpleFunc over math.Exp/Log/...).
        # Spark's ln/log2/log10 return NULL off-domain where PromQL
        # returns -Inf/NaN; the nvl2 shim restores upstream's values.
        expr = {
            "exp": F.exp(v),
            "ln": F.log(v),
            "log2": F.log2(v),
            "log10": F.log10(v),
        }[fn]
        if fn == "exp":
            return res.withColumn("value", expr)
        neg_inf, nan = F.lit(float("-inf")), F.lit(float("nan"))
        fixed = (
            F.when(v == 0.0, neg_inf)
            .when(v < 0.0, nan)
            .when(F.isnan(v), nan)
            .otherwise(expr)
        )
        return res.withColumn("value", fixed)
    if fn in (
        "sin", "cos", "tan", "asin", "acos", "atan",
        "sinh", "cosh", "tanh", "deg", "rad",
    ):
        # Trigonometry tier (upstream promql/functions.go funcSin…funcRad)
        # — same convenience-tier status as exp/ln: libm-dependent, never
        # oracle-checked. Spark returns NaN off-domain for asin/acos like
        # Go's math package, so no shim is needed; deg/rad are exact
        # multiplies by the same 180/π double both runtimes fold.
        expr = {
            "sin": F.sin(v),
            "cos": F.cos(v),
            "tan": F.tan(v),
            "asin": F.asin(v),
            "acos": F.acos(v),
            "atan": F.atan(v),
            "sinh": F.sinh(v),
            "cosh": F.cosh(v),
            "tanh": F.tanh(v),
            "deg": F.degrees(v),
            "rad": F.radians(v),
        }[fn]
        return res.withColumn("value", expr)
    if fn == "round":
        # promql round(v, to_nearest=1) — upstream's exact formulation
        # (promql/functions.go funcRound): precompute inv = 1/to_nearest,
        # then floor(v·inv + 0.5)/inv. Multiply-add-floor-divide, all
        # IEEE-correctly-rounded ops on the same literals → deterministic.
        inv = 1.0 / (float(args[0]) if args else 1.0)
        return res.withColumn(
            "value",
            F.floor(v * F.lit(inv) + F.lit(0.5)).cast("double") / F.lit(inv),
        )
    if fn in ("sort", "sort_desc"):
        return res.orderBy(F.asc("value") if fn == "sort" else F.desc("value"))
    # Prometheus time-component functions (promql/functions.go funcHour etc.):
    # the input VALUE is interpreted as an epoch-seconds timestamp (the
    # idiom is `hour(timestamp(m))` / `hour(vector(time()))`), components
    # extracted in UTC. minute/hour/day_of_week are pure integer arithmetic
    # on the epoch (no calendar needed); the calendar ones go through
    # timestamp_seconds under the session's pinned UTC zone. All return
    # doubles (PromQL sample values are floats).
    if fn in ("minute", "hour", "day_of_week"):
        div, mod, shift = {
            "minute": (60, 60, 0),
            "hour": (3600, 24, 0),
            # epoch day 0 = Thursday; PromQL counts 0 = Sunday
            "day_of_week": (86400, 7, 4),
        }[fn]
        # pmod, not %: Spark's % keeps the dividend's sign, so pre-1970
        # epochs would yield hour(-3600) = -1 instead of 23
        return res.withColumn(
            "value",
            F.pmod(
                F.floor(v / F.lit(float(div))) + F.lit(shift), F.lit(mod)
            ).cast("double"),
        )
    if fn in ("day_of_month", "day_of_year", "month", "year", "days_in_month"):
        t = F.timestamp_seconds(F.floor(v).cast("long"))
        comp = {
            "day_of_month": F.dayofmonth(t),
            "day_of_year": F.dayofyear(t),
            "month": F.month(t),
            "year": F.year(t),
            "days_in_month": F.dayofmonth(F.last_day(t)),
        }[fn]
        return res.withColumn("value", comp.cast("double"))
    raise ValueError(f"unsupported scalar function {fn!r}")


def _balanced(s: str) -> bool:
    """True iff parens/braces/brackets balance — guards the comparison
    split from bisecting `clamp(m, 1, 2)`-style argument lists."""
    depth = 0
    for ch in s:
        if ch in "({[":
            depth += 1
        elif ch in ")}]":
            depth -= 1
            if depth < 0:
                return False
    return depth == 0


# scalar-on-the-LEFT comparisons (`5 < m`) evaluate the vector side and
# flip the operator (`m > 5`) — result samples always come from the vector
_CMP_FLIP = {">": "<", "<": ">", ">=": "<=", "<=": ">=", "==": "==", "!=": "!="}

_CMP_OPS = {
    ">": lambda v, s: v > s,
    "<": lambda v, s: v < s,
    ">=": lambda v, s: v >= s,
    "<=": lambda v, s: v <= s,
    "==": lambda v, s: v == s,
    "!=": lambda v, s: v != s,
}


def _apply_scalar_cmp(
    res: DataFrame, op: str, scalar: float, as_bool: bool
) -> DataFrame:
    """Vector-vs-scalar comparison (PromQL filter semantics): keep samples
    whose value satisfies the predicate; with the ``bool`` modifier,
    keep every sample and replace the value with 1.0/0.0."""
    cond = _CMP_OPS[op](F.col("value"), F.lit(scalar))
    if as_bool:
        return res.withColumn(
            "value", F.when(cond, F.lit(1.0)).otherwise(F.lit(0.0))
        )
    return res.filter(cond)
