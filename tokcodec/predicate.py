"""Predicate DSL: one expression, three executions — row-group pushdown
at the Parquet scan, a vectorized residual filter per batch, AND a
zone-map check over TOKB per-block column stats.

The reference compiles Scala lambdas into parquet-mr FilterPredicate
trees (Predicate.scala:13-17, 47-183) and its `build` form returns BOTH
the native lambda and the pushdown tree (Predicate.scala:10,19-27).  The
idiomatic Python equivalent is a small `col()` DSL whose nodes emit

* a ``pyarrow.dataset`` expression → ``ray.data.read_parquet(filter=...)``
  (row-group/page pruning, the reference's pushdown role),
* a batch-level boolean-mask function via ``pyarrow.compute`` kernels →
  residual ``map_batches`` filtering (the reference's native lambda), and
* a conservative ``stats_may_match(block_stats)`` → TOKB block skipping
  (the reference reader's FilterPredicate-over-row-group-stats role,
  ExampleReadSupport.java:55-74).

Covered semantics, mirroring SURVEY.md §2 #6-#11: comparison ops over
int/long/float/double/boolean/string; and/or/not; operand flipping
(`5 > col` — natural via Python reflected dunders); literal type
coercion to the column type (done by pyarrow.compute casting rules);
null comparisons (`== None` → is_null); implicit boolean columns.
Dotted names (`col("address.zip")`) traverse struct fields, matching the
reference's nested getter chains (Common.scala:26-52) — the pushdown
emits a nested field reference and the residual walks pc.struct_field.
"""

from __future__ import annotations

from typing import Any, Callable

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from tokcodec.bloom import might_contain


def _resolve(table: pa.Table, parts: tuple[str, ...]):
    """Walk a dotted path: top-level column, then struct fields
    (Common.scala:26-52's getter-chain semantics; non-struct traversal
    is an error, not a silent null)."""
    if parts[0] not in table.column_names:
        raise KeyError(f"Invalid fields: ['{parts[0]}']")
    arr = table.column(parts[0])
    for p in parts[1:]:
        typ = arr.type
        if not pa.types.is_struct(typ):
            raise TypeError(
                f"cannot traverse '.{p}' of non-struct column "
                f"'{'.'.join(parts)}' (got {typ})"
            )
        if typ.field(p) is None:  # pragma: no cover - arrow raises first
            raise KeyError(f"Invalid fields: ['{p}']")
        arr = pc.struct_field(arr, p)
    return arr


def _always_true(_stats: dict) -> bool:
    return True


class Expr:
    """Boolean expression node; combine with & | ~."""

    def __bool__(self):
        # `p and q` would silently evaluate to just `q`, dropping the first
        # condition — same trap pandas/pyarrow expressions guard against
        raise TypeError(
            "predicate expressions are not truthy: combine with & | ~ "
            "(not `and`/`or`/`not`), compare with `is None` for absence"
        )

    def __init__(
        self,
        to_ds: Callable[[], pads.Expression],
        to_mask: Callable[[pa.Table], pa.ChunkedArray],
        desc: str,
        stats_fn: Callable[[dict], bool] | None = None,
        columns: frozenset[str] = frozenset(),
    ):
        self._to_ds = to_ds
        self._to_mask = to_mask
        self.desc = desc
        self._stats_fn = stats_fn or _always_true
        #: top-level column names this expression reads (for decode-time
        #: column-set widening when a projection excludes filter columns)
        self.columns = columns

    # ---- pushdown form (FilterPredicate analog)
    def dataset_filter(self) -> pads.Expression:
        return self._to_ds()

    # ---- native form (the dual lambda, Predicate.scala:19-27)
    def mask(self, table: pa.Table):
        return self._to_mask(table)

    def filter_table(self, table: pa.Table) -> pa.Table:
        return table.filter(self.mask(table))

    # ---- zone-map form: False only when NO row in a block can match
    def stats_may_match(self, stats: dict) -> bool:
        """`stats` maps column name → {"min", "max", "nulls", "n"}
        (min/max absent for all-null columns; unknown columns are
        conservatively assumed to match)."""
        try:
            return self._stats_fn(stats)
        except TypeError:  # incomparable stat/literal types: no pruning
            return True

    def __and__(self, other: "Expr") -> "Expr":
        return Expr(
            lambda: self.dataset_filter() & other.dataset_filter(),
            lambda t: pc.and_kleene(self.mask(t), other.mask(t)),
            f"({self.desc} && {other.desc})",
            lambda s: self.stats_may_match(s) and other.stats_may_match(s),
            self.columns | other.columns,
        )

    def __or__(self, other: "Expr") -> "Expr":
        return Expr(
            lambda: self.dataset_filter() | other.dataset_filter(),
            lambda t: pc.or_kleene(self.mask(t), other.mask(t)),
            f"({self.desc} || {other.desc})",
            lambda s: self.stats_may_match(s) or other.stats_may_match(s),
            self.columns | other.columns,
        )

    def __invert__(self) -> "Expr":
        # NOT is conservative in the zone map: may-match of the child
        # doesn't imply must-match, so no pruning through negation
        return Expr(
            lambda: ~self.dataset_filter(),
            lambda t: pc.invert(self.mask(t)),
            f"!({self.desc})",
            None,
            self.columns,
        )


def _cmp_stats(parts: tuple[str, ...], op: str, lit: Any) -> Callable[[dict], bool]:
    """Zone-map check for `col op literal` (False = provably no match)."""
    name = ".".join(parts)

    def check(stats: dict) -> bool:
        s = stats.get(name)
        if s is None:
            return True
        if op == "==" and "bloom" in s:
            # per-block bloom (PARQUET-41 role): provably-absent point
            # lookups skip even when [min, max] straddles the literal
            if not might_contain(s["bloom"], lit):
                return False
        if "min" not in s or "max" not in s:
            # min/max absent: prune ONLY when provably all-null (every
            # comparison null → filtered); otherwise the stats were
            # withheld (NaN-bearing floats, oversized strings) — no claim
            return s.get("nulls", 0) < s.get("n", 1)
        lo, hi = s["min"], s["max"]
        if op == ">":
            return hi > lit
        if op == "<":
            return lo < lit
        if op == ">=":
            return hi >= lit
        if op == "<=":
            return lo <= lit
        if op == "==":
            return lo <= lit <= hi
        if op == "!=":
            return not (lo == hi == lit)
        return True

    return check


class Col:
    """A column reference (dotted for nested struct fields): comparisons
    yield Expr; bare use in a boolean context is the implicit
    `eq(col, True)` (Predicate.scala:114-117)."""

    def __init__(self, name: str):
        self.name = name
        self.parts = tuple(name.split("."))

    def _ds_field(self) -> pads.Expression:
        return pads.field(*self.parts)

    def _cmp(self, op: str, pc_fn, other: Any) -> Expr:
        name, parts = self.name, self.parts
        if other is None:
            # null-literal comparisons (Predicate.scala:120-126)
            if op in ("==",):
                return self.is_null()
            if op in ("!=",):
                return self.is_valid()
            raise ValueError(f"cannot order-compare column {name} with null")
        if isinstance(other, Col):
            oparts = other.parts
            return Expr(
                lambda: getattr(self._ds_field(), _DUNDER[op])(other._ds_field()),
                lambda t: pc_fn(_resolve(t, parts), _resolve(t, oparts)),
                f"{name} {op} {other.name}",
                None,
                frozenset({parts[0], oparts[0]}),
            )
        return Expr(
            lambda: getattr(self._ds_field(), _DUNDER[op])(pa.scalar(other)),
            lambda t: pc_fn(_resolve(t, parts), _coerce(other, _resolve(t, parts).type)),
            f"{name} {op} {other!r}",
            _cmp_stats(parts, op, other),
            frozenset({parts[0]}),
        )

    def __gt__(self, o):
        return self._cmp(">", pc.greater, o)

    def __lt__(self, o):
        return self._cmp("<", pc.less, o)

    def __ge__(self, o):
        return self._cmp(">=", pc.greater_equal, o)

    def __le__(self, o):
        return self._cmp("<=", pc.less_equal, o)

    def __eq__(self, o):  # type: ignore[override]
        return self._cmp("==", pc.equal, o)

    def __ne__(self, o):  # type: ignore[override]
        return self._cmp("!=", pc.not_equal, o)

    def is_null(self) -> Expr:
        name, parts = self.name, self.parts

        def stats_fn(stats: dict) -> bool:
            s = stats.get(name)
            return True if s is None else s.get("nulls", 1) > 0

        return Expr(
            lambda: pads.field(*parts).is_null(),
            lambda t: pc.is_null(_resolve(t, parts)),
            f"{name} is null",
            stats_fn,
            frozenset({parts[0]}),
        )

    def is_valid(self) -> Expr:
        name, parts = self.name, self.parts

        def stats_fn(stats: dict) -> bool:
            s = stats.get(name)
            if s is None:
                return True
            return s.get("nulls", 0) < s.get("n", 1)

        return Expr(
            lambda: ~pads.field(*parts).is_null(),
            lambda t: pc.is_valid(_resolve(t, parts)),
            f"{name} is not null",
            stats_fn,
            frozenset({parts[0]}),
        )

    def isin(self, values) -> Expr:
        name, parts = self.name, self.parts
        vals = list(values)

        def stats_fn(stats: dict) -> bool:
            s = stats.get(name)
            if s is None:
                return True
            if "bloom" in s:
                if not any(might_contain(s["bloom"], v) for v in vals):
                    return False
            if "min" not in s or "max" not in s:
                return s.get("nulls", 0) < s.get("n", 1)
            return any(s["min"] <= v <= s["max"] for v in vals)

        return Expr(
            lambda: pads.field(*parts).isin(vals),
            lambda t: pc.is_in(_resolve(t, parts), value_set=pa.array(vals)),
            f"{name} in {vals!r}",
            stats_fn,
            frozenset({parts[0]}),
        )

    def true_(self) -> Expr:
        """Implicit boolean predicate: `col` used as a condition."""
        return self._cmp("==", pc.equal, True)


_DUNDER = {
    ">": "__gt__",
    "<": "__lt__",
    ">=": "__ge__",
    "<=": "__le__",
    "==": "__eq__",
    "!=": "__ne__",
}


def _coerce(lit: Any, t: pa.DataType):
    """Coerce the literal to the column type (Predicate.scala:40-45 /
    128-139 semantics); pyarrow casts where safe."""
    try:
        return pa.scalar(lit, type=t)
    except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
        return pa.scalar(lit)


def col(name: str) -> Col:
    return Col(name)


class Predicates:
    """Dual predicate (the reference's `Predicates(native, parquet)`,
    Predicate.scala:10): pushdown expression + residual batch filter."""

    def __init__(self, expr: Expr):
        self.expr = expr
        self.parquet = expr.dataset_filter()
        self.native = expr.filter_table


def build(expr: Expr) -> Predicates:
    return Predicates(expr)


def read_parquet_filtered(paths, expr: Expr | None = None, columns=None, **kw):
    """ray.data.read_parquet with pushdown + residual belt-and-suspenders
    (SURVEY.md §2 #5): row groups are pruned by the scan filter, and the
    same predicate re-runs vectorized per batch (cheap on pruned data)."""
    import ray.data

    if expr is None:
        return ray.data.read_parquet(paths, columns=columns, **kw)
    read_cols = columns
    extra: list[str] = []
    if columns is not None:
        # widen the scan by the predicate's columns so the residual filter
        # can resolve them, then re-project — without this a predicate on
        # an unselected column KeyErrors in the residual pass
        extra = sorted(set(expr.columns) - set(columns))
        if extra:
            read_cols = list(columns) + extra
    ds = ray.data.read_parquet(paths, columns=read_cols, filter=expr.dataset_filter(), **kw)
    if extra:
        keep = list(columns)
        return ds.map_batches(
            lambda t: expr.filter_table(t).select(keep),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return ds.map_batches(expr.filter_table, batch_format="pyarrow", zero_copy_batch=True)
