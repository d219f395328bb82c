from . import ingest, sinks  # noqa: F401
