from . import casting, cleaning, durations, text  # noqa: F401
