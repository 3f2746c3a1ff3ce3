from . import csv_source, geocode  # noqa: F401
