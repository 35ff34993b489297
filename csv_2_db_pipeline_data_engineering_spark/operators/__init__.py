from .transform import parse_date_expr, transform
from .validate import (
    annotate_reasons,
    duplicate_key_count,
    validate_rows,
    validate_structure,
)

__all__ = [
    "parse_date_expr",
    "transform",
    "annotate_reasons",
    "duplicate_key_count",
    "validate_rows",
    "validate_structure",
]
