from .weekly import weekly_rollup_stream, run_weekly_rollup_once

__all__ = ["weekly_rollup_stream", "run_weekly_rollup_once"]
