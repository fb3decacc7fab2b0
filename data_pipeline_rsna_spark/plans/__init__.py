from .audit import plan_report  # noqa: F401
