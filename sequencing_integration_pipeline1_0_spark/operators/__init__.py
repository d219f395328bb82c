from . import dedup, qa, fuzzy, aggregates, cdc, packed  # noqa: F401
