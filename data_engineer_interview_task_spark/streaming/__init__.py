from .weekly import weekly_rollup_stream, run_weekly_rollup_once
from .sessions import sessionize_stream, run_sessionize_once

__all__ = [
    "weekly_rollup_stream",
    "run_weekly_rollup_once",
    "sessionize_stream",
    "run_sessionize_once",
]
