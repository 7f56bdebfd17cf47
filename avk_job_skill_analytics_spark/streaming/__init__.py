from .incremental import incremental_file_pipeline, tumbling_window_counts  # noqa: F401
