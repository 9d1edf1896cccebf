"""Reusable column-expression helpers shared by operator modules."""

from trafficteach_spark.functions.exprs import exact_sum, money

__all__ = ["exact_sum", "money"]
