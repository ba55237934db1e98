from .validate import (
    check_stream,
    check_stream_against,
    check_stream_cumulative,
    read_windowed_summary,
    validate_stream_to_ledger,
    validate_stream_windowed_to_sink,
)

__all__ = [
    "check_stream",
    "check_stream_against",
    "check_stream_cumulative",
    "read_windowed_summary",
    "validate_stream_to_ledger",
    "validate_stream_windowed_to_sink",
]
