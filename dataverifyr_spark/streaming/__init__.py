from .validate import check_stream, check_stream_cumulative, validate_stream_to_ledger

__all__ = ["check_stream", "check_stream_cumulative", "validate_stream_to_ledger"]
