from .dates import previous_week_dates, previous_week_exprs
from .vector import cosine_expr, dot_expr, norm_expr

__all__ = [
    "previous_week_dates",
    "previous_week_exprs",
    "cosine_expr",
    "dot_expr",
    "norm_expr",
]
