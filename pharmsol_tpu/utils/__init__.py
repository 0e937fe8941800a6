from .cache import DEFAULT_CACHE_SIZE, LruCache  # noqa: F401
from .profiling import profile_trace, reset_stages, stage, stage_report  # noqa: F401
