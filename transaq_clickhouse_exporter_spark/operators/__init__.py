from .dedup import dedup_last_write_wins  # noqa: F401
