from .scalars import (
    de_comma_double,
    parse_bpi_updated,
    parse_iso_offset,
    format_wall_ts,
    BPI_UPDATED_FMT,
    ISO_OFFSET_FMT,
    WALL_FMT,
)

__all__ = [
    "de_comma_double",
    "parse_bpi_updated",
    "parse_iso_offset",
    "format_wall_ts",
    "BPI_UPDATED_FMT",
    "ISO_OFFSET_FMT",
    "WALL_FMT",
]
