from . import cleaning, dates, accession, vocab  # noqa: F401
