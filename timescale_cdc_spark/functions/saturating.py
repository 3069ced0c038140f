"""Timescale toolkit saturating i32 arithmetic: ``saturating_add``/
``sub``/``mul`` clamp to [-2^31, 2^31-1] instead of wrapping or (ANSI
Spark) raising, and the ``_pos`` variants clamp the lower bound at 0
— the toolkit's counter-safe arithmetic for metrics that must never
wrap. Implemented by computing in LONG (no i32 op can overflow a
long: |a*b| <= 2^62) and clamping with least/greatest — pure codegen
expressions, no UDFs."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

I32_MIN = -(1 << 31)
I32_MAX = (1 << 31) - 1


def _col(x: Column | str | int) -> Column:
    if isinstance(x, Column):
        return x
    if isinstance(x, str):
        return F.col(x)
    return F.lit(x)


def _clamp(v: Column, lo: int) -> Column:
    return F.least(
        F.greatest(v, F.lit(lo).cast("long")),
        F.lit(I32_MAX).cast("long"),
    ).cast("int")


def saturating_add(a, b) -> Column:
    """i32 a + b clamped to [-2^31, 2^31-1]."""
    return _clamp(_col(a).cast("long") + _col(b).cast("long"), I32_MIN)


def saturating_sub(a, b) -> Column:
    """i32 a - b clamped to [-2^31, 2^31-1]."""
    return _clamp(_col(a).cast("long") - _col(b).cast("long"), I32_MIN)


def saturating_mul(a, b) -> Column:
    """i32 a * b clamped to [-2^31, 2^31-1]."""
    return _clamp(_col(a).cast("long") * _col(b).cast("long"), I32_MIN)


def saturating_add_pos(a, b) -> Column:
    """i32 a + b clamped to [0, 2^31-1] (never goes negative)."""
    return _clamp(_col(a).cast("long") + _col(b).cast("long"), 0)


def saturating_sub_pos(a, b) -> Column:
    """i32 a - b clamped to [0, 2^31-1] (floors at zero — the
    counter-difference form)."""
    return _clamp(_col(a).cast("long") - _col(b).cast("long"), 0)
