"""File-dataset sources: discovery, latest-partition selection, landing."""

from .files import land, latest_dated_file, list_dataset_files  # noqa: F401
