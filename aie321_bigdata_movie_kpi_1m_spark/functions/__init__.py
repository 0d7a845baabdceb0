from .cleaning import (
    array_to_display_string,
    parse_list_column,
    to_double,
    to_long,
    year_of,
)

__all__ = [
    "array_to_display_string",
    "parse_list_column",
    "to_double",
    "to_long",
    "year_of",
]
