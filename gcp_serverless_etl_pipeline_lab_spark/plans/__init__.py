from .quality import validation_aggregate, quality_gate, DataQualityError
from .reports import summary_report, revenue_by_product, demo_summary

__all__ = [
    "validation_aggregate",
    "quality_gate",
    "DataQualityError",
    "summary_report",
    "revenue_by_product",
    "demo_summary",
]
