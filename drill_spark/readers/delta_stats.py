"""Delta per-file column statistics, stats-based file skipping, and
Z-order clustering — the data-skipping triad.

At 100 TB a Delta table is O(10^5-10^6) files; answering a selective
query by handing Spark the full file list makes the SCAN the
bottleneck no matter how good the plan is. Delta's answer (PROTOCOL.md
"Per-file Statistics", reference parity: Drill's parquet metadata
cache serves the same role for plain parquet — see
sqlfront REFRESH TABLE METADATA) is three cooperating pieces:

1. every ``add`` action carries ``stats`` — a JSON string with
   ``numRecords`` / ``minValues`` / ``maxValues`` / ``nullCount`` per
   top-level column, derived here from the parquet FOOTER of the file
   just written (no data re-read);
2. the reader prunes the snapshot's file list with a conjunctive
   predicate BEFORE Spark ever sees the scan — driver work linear in
   the file count, zero I/O on skipped files;
3. OPTIMIZE ... ZORDER BY re-clusters rows along interleaved
   equi-depth bucket ids so each file covers a small hyper-rectangle
   of the key space, which is what makes (2) selective on MORE THAN
   ONE column at once.

Skipping is an optimization, never a correctness dependency: files
without stats (older commits, foreign writers) are always kept, and
``read_delta`` re-applies the predicate as a real Catalyst filter, so
a conjunct the pruner cannot parse costs nothing but skipped
skipping.
"""

from __future__ import annotations

import json
import math
import re
from functools import reduce
from operator import add as _add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ----------------------------------------------------------- stats

# Delta's own writers cap stats collection at the first 32 columns
# (delta.dataSkippingNumIndexedCols); same default here.
MAX_STATS_COLS = 32

# String min/max above this length are omitted (a truncated max would
# be an invalid upper bound without tie-breaker surgery; long strings
# rarely prune anyway).
_MAX_STATS_STRING = 64


def _stat_value(v):
    """Footer statistic -> JSON-encodable Delta stats value, or None
    when the value cannot be represented faithfully (then min/max for
    that column is simply omitted — skipping stays sound)."""
    import datetime
    import decimal

    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return v
    if isinstance(v, float):
        return None if math.isnan(v) else v
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        try:
            v = v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, str):
        return v if len(v) <= _MAX_STATS_STRING else None
    return None


def file_stats_json(abs_path: str) -> str | None:
    """``add.stats`` JSON for one parquet data file, from its footer
    only: numRecords, and per top-level column min/max/nullCount
    aggregated across row groups. Nested columns (dotted
    path_in_schema) and un-stat'd columns are omitted — partial stats
    are valid per the protocol. Returns None if the footer is
    unreadable (the add action then just carries no stats)."""
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(abs_path).metadata
    except Exception:
        return None
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    incomplete: set = set()
    seen: list = []
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            if "." in name:  # nested leaf — omitted
                continue
            if name not in seen:
                if len(seen) >= MAX_STATS_COLS:
                    continue
                seen.append(name)
            st = col.statistics
            if st is None:
                incomplete.add(name)
                continue
            if st.null_count is not None:
                nulls[name] = nulls.get(name, 0) + int(st.null_count)
            else:
                incomplete.add(name)
            if not st.has_min_max:
                # an all-null chunk legitimately has no min/max and
                # does not narrow the aggregate range; any OTHER chunk
                # without min/max leaves the column's range unknown
                if st.null_count is None or \
                        int(st.null_count) != int(col.num_values):
                    incomplete.add(name)
                continue
            lo, hi = _stat_value(st.min), _stat_value(st.max)
            if lo is None or hi is None:
                incomplete.add(name)
                continue
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
    # a column whose min/max any row group failed to provide must not
    # advertise the partial range — it would wrongly prune
    for name in incomplete:
        mins.pop(name, None)
        maxs.pop(name, None)
    stats = {
        "numRecords": md.num_rows,
        "minValues": mins,
        "maxValues": maxs,
        "nullCount": {k: v for k, v in nulls.items()},
    }
    return json.dumps(stats)


# --------------------------------------------------- predicate pruning


_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<str>'(?:[^']|'')*')
      | (?P<num>-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)
      | (?P<ident>`[^`]+`|[A-Za-z_][A-Za-z_0-9]*)
      | (?P<op><=|>=|<>|!=|=|<|>|\(|\)|,)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "not", "between", "in", "is", "null",
             "date", "timestamp", "true", "false"}


def _tokenize(pred: str):
    out, pos = [], 0
    while pos < len(pred):
        if pred[pos].isspace():
            pos += 1
            continue
        m = _TOKEN_RE.match(pred, pos)
        if not m:
            return None
        pos = m.end()
        if m.group("str") is not None:
            out.append(("lit", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("num") is not None:
            n = m.group("num")
            out.append(("lit", float(n) if ("." in n or "e" in n.lower())
                        else int(n)))
        elif m.group("ident") is not None:
            word = m.group("ident")
            if word.lower() in _KEYWORDS:
                out.append(("kw", word.lower()))
            else:
                out.append(("col", word.strip("`")))
        else:
            out.append(("op", m.group("op")))
    return out


def parse_skipping_predicate(pred: str):
    """Parse ``pred`` into a boolean tree usable for min/max pruning,
    or None when the shape is beyond the pruner (expressions, function
    calls, unknown operators) — the caller then keeps every file and
    relies on the ordinary Catalyst filter.

    Grammar (full boolean structure, skipping-leaf conditions)::

        expr   := term (OR term)*
        term   := factor (AND factor)*
        factor := NOT factor | '(' expr ')' | cond
        cond   := col (=|!=|<>|<|<=|>|>=) literal
                | literal (...) col              -- flipped
                | col [NOT] BETWEEN literal AND literal
                | col [NOT] IN ( literal [, literal]* )
                | col IS [NOT] NULL
        literal := number | 'string' | DATE 'x' | TIMESTAMP 'x'
                 | TRUE | FALSE

    Nodes: ("and", [nodes]) / ("or", [nodes]) / ("not", node) /
    ("cmp", col, op, value) / ("in", col, [values]) /
    ("null", col, bool_is_null). Evaluation is the classic
    may-match / must-match dual (NOT flips between them), so OR and
    NOT prune soundly instead of disabling skipping.
    """
    toks = _tokenize(pred)
    if toks is None:
        return None
    got = _parse_or(toks, 0)
    if got is None or got[1] != len(toks):
        return None
    return got[0]


def _lit_at(toks, j):
    """(value, next_index) or None; folds DATE/TIMESTAMP 'x' and
    TRUE/FALSE into plain comparables."""
    n = len(toks)
    if j < n and toks[j] == ("kw", "date") and j + 1 < n \
            and toks[j + 1][0] == "lit":
        return str(toks[j + 1][1]), j + 2
    if j < n and toks[j] == ("kw", "timestamp") and j + 1 < n \
            and toks[j + 1][0] == "lit":
        return _norm_ts(str(toks[j + 1][1])), j + 2
    if j < n and toks[j][0] == "kw" and toks[j][1] in ("true", "false"):
        return toks[j][1] == "true", j + 1
    if j < n and toks[j][0] == "lit":
        return toks[j][1], j + 1
    return None


def _parse_or(toks, i):
    got = _parse_and(toks, i)
    if got is None:
        return None
    node, i = got
    branches = [node]
    while i < len(toks) and toks[i] == ("kw", "or"):
        got = _parse_and(toks, i + 1)
        if got is None:
            return None
        nxt, i = got
        branches.append(nxt)
    return (branches[0] if len(branches) == 1 else ("or", branches)), i


def _parse_and(toks, i):
    got = _parse_factor(toks, i)
    if got is None:
        return None
    node, i = got
    branches = [node]
    while i < len(toks) and toks[i] == ("kw", "and"):
        got = _parse_factor(toks, i + 1)
        if got is None:
            return None
        nxt, i = got
        branches.append(nxt)
    return (branches[0] if len(branches) == 1 else ("and", branches)), i


def _parse_factor(toks, i):
    n = len(toks)
    if i < n and toks[i] == ("kw", "not"):
        got = _parse_factor(toks, i + 1)
        if got is None:
            return None
        node, i = got
        return ("not", node), i
    if i < n and toks[i] == ("op", "("):
        got = _parse_or(toks, i + 1)
        if got is None:
            return None
        node, i = got
        if i >= n or toks[i] != ("op", ")"):
            return None
        return node, i + 1
    return _parse_leaf(toks, i)


def _parse_leaf(toks, i):
    """One skipping condition, or None if the shape is unsupported."""
    n = len(toks)
    if i < n and toks[i][0] == "col":
        col = toks[i][1]
        negated = False
        j = i + 1
        if j < n and toks[j] == ("kw", "not") and j + 1 < n \
                and toks[j + 1] in (("kw", "between"), ("kw", "in")):
            negated = True
            j += 1
        if j < n and toks[j][0] == "op" and not negated \
                and toks[j][1] not in ("(", ")", ","):
            op = toks[j][1]
            got = _lit_at(toks, j + 1)
            if got is None:
                return None
            v, j = got
            return ("cmp", col, op, v), j
        if j < n and toks[j] == ("kw", "between"):
            got = _lit_at(toks, j + 1)
            if got is None:
                return None
            lo, j = got
            if j >= n or toks[j] != ("kw", "and"):
                return None
            got = _lit_at(toks, j + 1)
            if got is None:
                return None
            hi, j = got
            node = ("and", [("cmp", col, ">=", lo), ("cmp", col, "<=", hi)])
            return (("not", node) if negated else node), j
        if j < n and toks[j] == ("kw", "in"):
            if j + 1 >= n or toks[j + 1] != ("op", "("):
                return None
            vals, j = [], j + 2
            while True:
                got = _lit_at(toks, j)
                if got is None:
                    return None
                v, j = got
                vals.append(v)
                if j < n and toks[j] == ("op", ","):
                    j += 1
                    continue
                if j < n and toks[j] == ("op", ")"):
                    j += 1
                    break
                return None
            node = ("in", col, vals)
            return (("not", node) if negated else node), j
        if j < n and toks[j] == ("kw", "is") and not negated:
            if j + 1 < n and toks[j + 1] == ("kw", "null"):
                return ("null", col, True), j + 2
            if j + 2 < n and toks[j + 1] == ("kw", "not") \
                    and toks[j + 2] == ("kw", "null"):
                return ("null", col, False), j + 3
            return None
        return None
    if i < n and toks[i][0] in ("lit", "kw"):
        # flipped comparison: literal op col
        got = _lit_at(toks, i)
        if got is None:
            return None
        v, j = got
        if j + 1 < n and toks[j][0] == "op" and toks[j + 1][0] == "col":
            op = toks[j][1]
            flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<=",
                    "=": "=", "!=": "!=", "<>": "<>"}
            if op not in flip:
                return None
            return ("cmp", toks[j + 1][1], flip[op], v), j + 2
        return None
    return None


def _norm_ts(s: str) -> str:
    """'YYYY-MM-DD[ T]HH:MM:SS[.f][Z]' -> fixed-width ISO so that
    lexicographic compare == chronological compare (how timestamp
    stats, stored as isoformat strings, are tested)."""
    s = s.strip().replace(" ", "T").rstrip("Z")
    if "T" not in s:
        s += "T00:00:00"
    base, dot, frac = s.partition(".")
    if len(base) == 16:  # minutes precision
        base += ":00"
    return base + "." + (frac + "000000")[:6]


def _comparable(stat_v, lit_v):
    """Coerce a (stats value, literal value) pair onto one comparable
    domain, or None when the types do not line up (then the conjunct
    cannot prune)."""
    if isinstance(stat_v, bool) or isinstance(lit_v, bool):
        if isinstance(stat_v, bool) and isinstance(lit_v, bool):
            return stat_v, lit_v
        return None
    if isinstance(stat_v, (int, float)) and isinstance(lit_v, (int, float)):
        return float(stat_v), float(lit_v)
    if isinstance(stat_v, str) and isinstance(lit_v, str):
        # timestamp stats serialize as isoformat — normalize both when
        # the literal looks like a timestamp so the compare stays
        # chronological; plain strings compare as-is
        if "T" in stat_v and ":" in stat_v:
            return _norm_ts(stat_v), _norm_ts(lit_v)
        return stat_v, lit_v
    return None


def _cmp_satisfiable(lo, hi, op: str, v) -> bool:
    """Can ANY value in [lo, hi] satisfy ``x op v``? Unknown bounds
    (None) are permissive on their side."""
    pair_lo = _comparable(lo, v) if lo is not None else None
    pair_hi = _comparable(hi, v) if hi is not None else None
    if (lo is not None and pair_lo is None) or \
            (hi is not None and pair_hi is None):
        return True  # type mismatch — never prune
    if op in ("=",):
        if pair_lo is not None and pair_lo[0] > pair_lo[1]:
            return False
        if pair_hi is not None and pair_hi[0] < pair_hi[1]:
            return False
        return True
    if op in ("<",):
        return pair_lo is None or pair_lo[0] < pair_lo[1]
    if op in ("<=",):
        return pair_lo is None or pair_lo[0] <= pair_lo[1]
    if op in (">",):
        return pair_hi is None or pair_hi[0] > pair_hi[1]
    if op in (">=",):
        return pair_hi is None or pair_hi[0] >= pair_hi[1]
    if op in ("!=", "<>"):
        # unsatisfiable only when the file is constant at exactly v
        if pair_lo is not None and pair_hi is not None \
                and pair_lo[0] == pair_lo[1] and pair_hi[0] == pair_hi[1]:
            return False
        return True
    return True


def _cmp_always(lo, hi, op: str, v) -> bool:
    """Does EVERY value in [lo, hi] satisfy ``x op v``? Requires both
    bounds known and comparable — anything unknown is not provable."""
    if lo is None or hi is None:
        return False
    pair_lo = _comparable(lo, v)
    pair_hi = _comparable(hi, v)
    if pair_lo is None or pair_hi is None:
        return False
    slo, vlo = pair_lo
    shi, vhi = pair_hi
    if op == "=":
        return slo == vlo and shi == vhi and slo == shi
    if op == "<":
        return shi < vhi
    if op == "<=":
        return shi <= vhi
    if op == ">":
        return slo > vlo
    if op == ">=":
        return slo >= vlo
    if op in ("!=", "<>"):
        return shi < vhi or slo > vlo  # whole range excludes v
    return False


def file_may_match(stats: dict | None, node, pv: dict | None = None,
                   name_map: dict | None = None) -> bool:
    """Can this file possibly contain a row satisfying ``node`` (a
    parse_skipping_predicate tree, or a legacy list of conjuncts)?
    ``stats`` is the parsed add.stats dict (or None — then only
    partition values can prune). ``pv`` gives partition values (the
    column IS constant in the file: min = max = value). ``name_map``
    translates predicate (logical) column names to stats keys
    (physical names under column mapping).

    Evaluation is the may/must dual: ``may(x)`` over-approximates "some
    row satisfies x", ``must(x)`` under-approximates "every row
    satisfies x", and NOT swaps them (may(NOT x) = not must(x)) — the
    same structure as Delta's DataSkippingReader / Iceberg's
    InclusiveMetricsEvaluator, so OR and NOT prune soundly instead of
    disabling skipping."""
    if isinstance(node, list):
        node = ("and", node)
    stats = stats or {}
    mins = stats.get("minValues") or {}
    maxs = stats.get("maxValues") or {}
    nulls = stats.get("nullCount") or {}
    num = stats.get("numRecords")
    pv = pv or {}

    def key(col):
        return (name_map or {}).get(col, col)

    def bounds(col):
        k = key(col)
        if k in pv:
            v = pv[k]
            if v is None:
                return None, None
            # partition values are strings in the log; try numeric
            try:
                fv = float(v)
                return fv, fv
            except (TypeError, ValueError):
                return v, v
        return mins.get(k), maxs.get(k)

    def all_null(col):
        k = key(col)
        if k in pv:
            return pv[k] is None
        return num is not None and nulls.get(k) == num and num > 0

    def none_null(col):
        k = key(col)
        if k in pv:
            return pv[k] is not None
        return nulls.get(k) == 0

    def may(c) -> bool:
        kind = c[0]
        if kind == "and":
            return all(may(x) for x in c[1])
        if kind == "or":
            return any(may(x) for x in c[1])
        if kind == "not":
            return not must(c[1])
        if kind == "cmp":
            _, col, op, v = c
            if all_null(col):
                return False  # comparisons with null never hold
            return _cmp_satisfiable(*bounds(col), op, v)
        if kind == "in":
            _, col, vals = c
            if all_null(col):
                return False
            lo, hi = bounds(col)
            return any(_cmp_satisfiable(lo, hi, "=", v) for v in vals)
        if kind == "null":
            _, col, want_null = c
            if want_null:
                return not none_null(col)
            return not all_null(col)
        return True  # unknown shape: never prune

    def must(c) -> bool:
        kind = c[0]
        if kind == "and":
            return all(must(x) for x in c[1])
        if kind == "or":
            # sound under-approximation: one branch covering every row
            return any(must(x) for x in c[1])
        if kind == "not":
            return not may(c[1])
        if kind == "cmp":
            _, col, op, v = c
            # a single null row fails any comparison
            return none_null(col) and _cmp_always(*bounds(col), op, v)
        if kind == "in":
            _, col, vals = c
            if not none_null(col):
                return False
            lo, hi = bounds(col)
            return any(_cmp_always(lo, hi, "=", v) for v in vals)
        if kind == "null":
            _, col, want_null = c
            if want_null:
                return all_null(col)
            return none_null(col)
        return False  # unknown shape: never provable

    return may(node)


def prune_snapshot_files(snap, predicate: str,
                         name_map: dict | None = None):
    """(kept_files, n_skipped): the subset of ``snap.files`` whose
    stats/partition values admit the predicate. Files without stats
    are always kept; an un-parseable predicate keeps everything."""
    node = parse_skipping_predicate(predicate)
    if node is None:
        return snap.files, 0
    kept = {}
    for rel, entry in snap.files.items():
        raw = entry.get("stats")
        stats = None
        if raw:
            try:
                stats = json.loads(raw) if isinstance(raw, str) else raw
            except (TypeError, ValueError):
                stats = None
        if file_may_match(stats, node, entry.get("pv"), name_map):
            kept[rel] = entry
    return kept, len(snap.files) - len(kept)


# ------------------------------------------------------------ Z-order

ZORDER_BITS = 8  # equi-depth buckets per dimension (256)


def zorder_expression(df: DataFrame, cols: list[str],
                      bits: int = ZORDER_BITS) -> Column:
    """Interleaved-bit Z-value over equi-depth bucket ids of ``cols``.

    Per column: ~2^bits-1 quantile boundaries (approxQuantile on a
    bounded driver list) define 2^bits equi-depth buckets; the bucket
    id is the count of boundaries <= value — one codegen
    ``size(filter(boundaries, b -> x >= b))`` over a literal array, no
    shuffle, no window (a global rank would collapse to one
    partition). Equi-depth (not width_bucket's equi-width) is what
    keeps skewed columns from dumping everything into one bucket.

    The Z-value interleaves the bucket bits round-robin
    (bit i of column j lands at position i*d + j), so sorting by it
    gives every prefix of files a bounded range in EVERY dimension —
    the property multi-column data skipping needs. Numeric, date and
    timestamp columns supported; d*bits must fit a long.
    """
    d = len(cols)
    if d == 0:
        raise ValueError("zorder needs at least one column")
    if d * bits > 63:
        raise ValueError(f"{d} zorder columns x {bits} bits exceed a long")
    types = dict(df.dtypes)
    casts = {}
    for c in cols:
        t = types.get(c)
        if t is None:
            raise ValueError(f"zorder column {c} not in DataFrame")
        if t in ("date",):
            casts[c] = F.datediff(F.col(c), F.lit("1970-01-01")).cast("double")
        elif t.startswith("timestamp"):
            casts[c] = F.unix_timestamp(F.col(c)).cast("double")
        elif t in ("tinyint", "smallint", "int", "bigint", "float",
                   "double") or t.startswith("decimal"):
            casts[c] = F.col(c).cast("double")
        elif t == "string":
            # order-preserving prefix encoding: the first 6 UTF-8
            # bytes, zero-padded, as a 48-bit unsigned value (exact in
            # a double). UTF-8 byte order == code-point order ==
            # Spark's binary-collation string order, so equi-depth
            # buckets of the prefix cluster the strings correctly;
            # strings sharing a 6-byte prefix share a bucket, which
            # only costs selectivity, never correctness.
            casts[c] = F.conv(
                F.rpad(F.hex(F.substring(F.encode(F.col(c), "UTF-8"),
                                         1, 6)), 12, "0"),
                16, 10).cast("double")
        else:
            raise NotImplementedError(
                f"zorder on {t} column {c}: numeric/date/timestamp/"
                "string columns are supported")
    probe = df.select(*[casts[c].alias(f"__zq_{i}")
                        for i, c in enumerate(cols)])
    n_b = (1 << bits) - 1
    probs = [(i + 1) / (n_b + 1) for i in range(n_b)]
    quantiles = probe.approxQuantile(
        [f"__zq_{i}" for i in range(d)], probs, 0.001)
    bucket_cols = []
    for i, c in enumerate(cols):
        bounds = sorted(set(b for b in quantiles[i] if b == b))  # drop NaN
        if not bounds:
            bucket_cols.append(F.lit(0))
            continue
        arr = F.expr("array(" + ",".join(
            "cast(%r as double)" % b for b in bounds) + ")")
        x = casts[c]
        bucket = F.size(F.filter(arr, lambda b: x >= b))
        if len(bounds) < n_b:
            # low-cardinality column: its bucket ids only reach
            # len(bounds), leaving the HIGH interleave bits dead zeros
            # — the z-sort would then order almost entirely by the
            # other columns and this one would never prune. Rescale
            # onto the full 2^bits range (order-preserving).
            bucket = F.floor(
                bucket.cast("double") * (n_b / len(bounds))).cast("int")
        bucket_cols.append(F.when(x.isNull(), F.lit(0)).otherwise(bucket))
    terms = []
    for j, b in enumerate(bucket_cols):
        for i in range(bits):
            terms.append(F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)).cast("long"),
                i * d + j))
    return reduce(_add, terms).alias("__z")
