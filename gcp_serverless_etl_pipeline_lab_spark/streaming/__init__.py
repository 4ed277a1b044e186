from .file_stream import run_available_now, windowed_event_counts

__all__ = ["run_available_now", "windowed_event_counts"]
