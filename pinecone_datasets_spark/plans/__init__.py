from .explain import formatted_plan, pushed_filters, scan_read_schema

__all__ = ["formatted_plan", "pushed_filters", "scan_read_schema"]
