"""Predicate DSL: one expression, two executions — row-group pushdown at
the Parquet scan AND a vectorized residual filter per batch.

The reference compiles Scala lambdas into parquet-mr FilterPredicate
trees (Predicate.scala:13-17, 47-183) and its `build` form returns BOTH
the native lambda and the pushdown tree (Predicate.scala:10,19-27).  The
idiomatic Python equivalent is a small `col()` DSL whose nodes emit

* a ``pyarrow.dataset`` expression → ``ray.data.read_parquet(filter=...)``
  (row-group/page pruning, the reference's pushdown role), and
* a batch-level boolean-mask function via ``pyarrow.compute`` kernels →
  residual ``map_batches`` filtering (the reference's native lambda).

Covered semantics, mirroring SURVEY.md §2 #6-#11: comparison ops over
int/long/float/double/boolean/string; and/or/not; operand flipping
(`5 > col` — natural via Python reflected dunders); literal type
coercion to the column type (done by pyarrow.compute casting rules);
null comparisons (`== None` → is_null); implicit boolean columns.
"""

from __future__ import annotations

from typing import Any, Callable

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads


class Expr:
    """Boolean expression node; combine with & | ~."""

    def __init__(
        self,
        to_ds: Callable[[], pads.Expression],
        to_mask: Callable[[pa.Table], pa.ChunkedArray],
        desc: str,
    ):
        self._to_ds = to_ds
        self._to_mask = to_mask
        self.desc = desc

    # ---- pushdown form (FilterPredicate analog)
    def dataset_filter(self) -> pads.Expression:
        return self._to_ds()

    # ---- native form (the dual lambda, Predicate.scala:19-27)
    def mask(self, table: pa.Table):
        return self._to_mask(table)

    def filter_table(self, table: pa.Table) -> pa.Table:
        return table.filter(self.mask(table))

    def __and__(self, other: "Expr") -> "Expr":
        return Expr(
            lambda: self.dataset_filter() & other.dataset_filter(),
            lambda t: pc.and_kleene(self.mask(t), other.mask(t)),
            f"({self.desc} && {other.desc})",
        )

    def __or__(self, other: "Expr") -> "Expr":
        return Expr(
            lambda: self.dataset_filter() | other.dataset_filter(),
            lambda t: pc.or_kleene(self.mask(t), other.mask(t)),
            f"({self.desc} || {other.desc})",
        )

    def __invert__(self) -> "Expr":
        return Expr(
            lambda: ~self.dataset_filter(),
            lambda t: pc.invert(self.mask(t)),
            f"!({self.desc})",
        )


class Col:
    """A column reference: comparisons yield Expr; bare use in a boolean
    context is the implicit `eq(col, True)` (Predicate.scala:114-117)."""

    def __init__(self, name: str):
        self.name = name

    def _cmp(self, op: str, pc_fn, other: Any) -> Expr:
        name = self.name
        if other is None:
            # null-literal comparisons (Predicate.scala:120-126)
            if op in ("==",):
                return self.is_null()
            if op in ("!=",):
                return self.is_valid()
            raise ValueError(f"cannot order-compare column {name} with null")
        if isinstance(other, Col):
            oname = other.name
            return Expr(
                lambda: getattr(pads.field(name), _DUNDER[op])(pads.field(oname)),
                lambda t: pc_fn(t.column(name), t.column(oname)),
                f"{name} {op} {oname}",
            )
        return Expr(
            lambda: getattr(pads.field(name), _DUNDER[op])(pa.scalar(other)),
            lambda t: pc_fn(t.column(name), _coerce(other, t.column(name).type)),
            f"{name} {op} {other!r}",
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
        name = self.name
        return Expr(
            lambda: pads.field(name).is_null(),
            lambda t: pc.is_null(t.column(name)),
            f"{name} is null",
        )

    def is_valid(self) -> Expr:
        name = self.name
        return Expr(
            lambda: ~pads.field(name).is_null(),
            lambda t: pc.is_valid(t.column(name)),
            f"{name} is not null",
        )

    def isin(self, values) -> Expr:
        name = self.name
        vals = list(values)
        return Expr(
            lambda: pads.field(name).isin(vals),
            lambda t: pc.is_in(t.column(name), value_set=pa.array(vals)),
            f"{name} in {vals!r}",
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
    ds = ray.data.read_parquet(paths, columns=columns, filter=expr.dataset_filter(), **kw)
    return ds.map_batches(expr.filter_table, batch_format="pyarrow", zero_copy_batch=True)
