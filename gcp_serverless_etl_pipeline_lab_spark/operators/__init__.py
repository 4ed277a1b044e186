from .validate import annotate, ERROR_COL
from .transform import split_clean_errors, CLEAN_COLUMNS

__all__ = ["annotate", "ERROR_COL", "split_clean_errors", "CLEAN_COLUMNS"]
