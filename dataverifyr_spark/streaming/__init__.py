from .validate import check_stream, validate_stream_to_ledger

__all__ = ["check_stream", "validate_stream_to_ledger"]
